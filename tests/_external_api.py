"""External-API contract extraction (VERDICT r4 #4: stub fidelity).

The vispy / tkinter / pyrealsense2 layers only ever execute against the
in-memory stubs (tests/_vispy_stub.py, _tk_stub.py, _pyrealsense2_stub.py)
because the real libraries are not installable here. That leaves a
by-construction hole: a builder edit that calls a NEW external API would be
"tested" by silently extending the stub. This module closes the hole:

- :func:`extract_contract` walks the ASTs of every first-party source file
  and records every dotted attribute chain rooted at an external module
  alias (``import vispy`` / ``import tkinter as tk`` / ``from pyrealsense2
  import pyrealsense2 as rs`` / ``from vispy.scene import ArcballCamera`` …)
  — the exact module-level surface the app touches. Chains through call
  results (instance methods) are out of AST reach and are instead pinned by
  the stubs' behavioural tests (test_ui_headless / test_realsense_stub).
- The surface is FROZEN in ``tests/external_api_contract.json``.
  tests/test_external_api_contract.py asserts (i) the checked-in contract
  matches a fresh extraction (so growing an unmodeled external call fails
  the suite until the contract AND stubs are updated together), (ii) every
  chain resolves on the stubs, and (iii) the chains are a subset of what
  the reference itself uses (/root/reference) plus an explicit allowlist
  for this framework's additions.

Regenerate after an intentional surface change::

    python -m tests._external_api --write
"""

import ast
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

EXTERNAL_ROOTS = ("vispy", "tkinter", "pyrealsense2")

CONTRACT_PATH = Path(__file__).resolve().parent / "external_api_contract.json"


def discover_app_files(root: Path = REPO):
    """Every first-party source file that could touch an external UI /
    sensor API: repo-root scripts + the whole package. Discovery (not a
    hardcoded list) so a NEW file growing an external import cannot dodge
    the contract."""
    files = sorted(root.glob("*.py"))
    files += sorted((root / "recognizer3d_tpu").rglob("*.py"))
    return [f for f in files if "__pycache__" not in f.parts]


def extract_file(path: Path):
    """All dotted attribute chains rooted at an external-module alias in
    one file (plus the imported names themselves — ``from vispy.scene
    import ArcballCamera`` is surface even without attribute access).

    Two data-flow extensions close the AST blind spots the app actually
    exercises:

    - instance aliasing: ``self._rs = rs`` makes ``self._rs.<chain>``
      count as ``rs.<chain>`` (realsense_camera.py keeps the module on
      the instance);
    - literal-table getattr: ``for name, v in TABLE.items():
      getattr(<chain>, name)`` where TABLE is a module-level dict with
      constant string keys records ``<chain>.<key>`` for every key (the
      depth-sensor options table) — so the option NAMES are contract
      surface, checked against the reference's own rs.option usage.
    """
    tree = ast.parse(path.read_text())
    aliases = {}
    chains = set()
    literal_dicts = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for n in node.names:
                top = n.name.split(".")[0]
                if top in EXTERNAL_ROOTS:
                    if n.asname:
                        aliases[n.asname] = n.name
                    else:
                        aliases[top] = top
                    if "." in n.name:
                        chains.add(n.name)  # submodule import is surface
        elif isinstance(node, ast.ImportFrom):
            if (
                node.level == 0
                and node.module
                and node.module.split(".")[0] in EXTERNAL_ROOTS
            ):
                for n in node.names:
                    full = f"{node.module}.{n.name}"
                    chains.add(full)
                    aliases[n.asname or n.name] = full
        elif isinstance(node, ast.Assign) and isinstance(node.value, ast.Dict):
            # module/class-level literal dict with constant string keys
            keys = [
                k.value
                for k in node.value.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            if keys and len(keys) == len(node.value.keys):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        literal_dicts[t.id] = keys

    # instance aliasing: self.<attr> = <alias>
    self_aliases = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Name):
            if node.value.id in aliases:
                for t in node.targets:
                    if (
                        isinstance(t, ast.Attribute)
                        and isinstance(t.value, ast.Name)
                        and t.value.id == "self"
                    ):
                        self_aliases[t.attr] = aliases[node.value.id]

    def chain_of(node):
        """Dotted external chain for an Attribute/Name node, or None."""
        parts = []
        cur = node
        while isinstance(cur, ast.Attribute):
            parts.append(cur.attr)
            cur = cur.value
        if isinstance(cur, ast.Name):
            if cur.id in aliases:
                root = aliases[cur.id]
            else:
                return None
        elif (
            isinstance(cur, ast.Attribute)  # unreachable (loop consumed)
        ):
            return None
        else:
            return None
        return root + ("." + ".".join(reversed(parts)) if parts else "")

    def chain_with_self(node):
        parts = []
        cur = node
        while isinstance(cur, ast.Attribute):
            parts.append(cur.attr)
            cur = cur.value
        if (
            isinstance(cur, ast.Name)
            and cur.id == "self"
            and parts
            and parts[-1] in self_aliases
        ):
            root = self_aliases[parts[-1]]
            rest = list(reversed(parts[:-1]))
            return root + ("." + ".".join(rest) if rest else "")
        return None

    # loop-bound names over literal dicts: for NAME[, _] in TABLE.items()
    loop_key_names = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.For):
            it = node.iter
            table = None
            if (
                isinstance(it, ast.Call)
                and isinstance(it.func, ast.Attribute)
                and it.func.attr in ("items", "keys")
                and isinstance(it.func.value, ast.Name)
            ):
                table = it.func.value.id
            elif isinstance(it, ast.Name):
                table = it.id
            if table in literal_dicts:
                tgt = node.target
                if isinstance(tgt, ast.Tuple) and tgt.elts:
                    tgt = tgt.elts[0]
                if isinstance(tgt, ast.Name):
                    loop_key_names[tgt.id] = literal_dicts[table]

    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute):
            c = chain_of(node) or chain_with_self(node)
            if c:
                chains.add(c)
        elif (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "getattr"
            and len(node.args) >= 2
        ):
            base = chain_of(node.args[0]) or chain_with_self(node.args[0])
            if base:
                arg = node.args[1]
                if isinstance(arg, ast.Constant) and isinstance(
                    arg.value, str
                ):
                    chains.add(f"{base}.{arg.value}")
                elif isinstance(arg, ast.Name) and arg.id in loop_key_names:
                    for key in loop_key_names[arg.id]:
                        chains.add(f"{base}.{key}")
    return chains


def extract_contract(files=None):
    """{external root: sorted chains} over the given (default: discovered
    first-party) files."""
    by_root = {}
    for f in files if files is not None else discover_app_files():
        for chain in extract_file(f):
            by_root.setdefault(chain.split(".")[0], set()).add(chain)
    return {r: sorted(v) for r, v in sorted(by_root.items())}


def normalize(chain: str) -> str:
    """Fold the pip package's self-nesting (``pyrealsense2.pyrealsense2.X``
    -> ``pyrealsense2.X``) so surfaces compare across import styles."""
    return chain.replace("pyrealsense2.pyrealsense2", "pyrealsense2", 1)


def reference_surface(ref_root: Path = Path("/root/reference")):
    """The same extraction over the reference's sources (normalized)."""
    files = [
        f
        for f in sorted(ref_root.rglob("*.py"))
        if "__pycache__" not in f.parts
    ]
    out = set()
    for f in files:
        out.update(normalize(c) for c in extract_file(f))
    return out


def load_contract():
    return json.loads(CONTRACT_PATH.read_text())


def write_contract():
    CONTRACT_PATH.write_text(
        json.dumps(extract_contract(), indent=1) + "\n"
    )


if __name__ == "__main__":
    import sys

    if "--write" in sys.argv:
        write_contract()
        print(f"wrote {CONTRACT_PATH}")
    else:
        print(json.dumps(extract_contract(), indent=1))
