"""Stub-fidelity contract (VERDICT r4 #4).

The UI / sensor layers execute against in-memory stubs (vispy / tkinter /
pyrealsense2 are not installable here). These tests pin the stubs to the
EXACT external surface the app touches, so an app edit that grows an
unmodeled external call fails the suite instead of silently extending a
stub:

1. the checked-in contract (tests/external_api_contract.json) matches a
   fresh AST extraction of every first-party source file;
2. every contract chain resolves on the corresponding stub;
3. the surface is a subset of what the reference itself uses
   (/root/reference — same extraction), plus an explicit allowlist for
   this framework's additions;
4. the stubs expose no top-level surface beyond the contract (no
   speculative API that would mask a missing real-library feature).

After an INTENTIONAL surface change: update the stubs, then regenerate
with ``python -m tests._external_api --write``.
"""

from pathlib import Path

import pytest

from tests import _external_api as api

#: our additions beyond the reference's own external usage. EMPTY by
#: construction as of r5: the raw-depth + intrinsics additions ride the
#: same rs calls the reference makes (the extraction proves it).
ADDITIONS_ALLOWLIST: frozenset = frozenset()

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="module")
def contract():
    return api.load_contract()


def test_contract_is_current(contract):
    fresh = api.extract_contract()
    assert fresh == contract, (
        "the app's external API surface changed. If intentional: extend "
        "the stubs (tests/_vispy_stub.py / _tk_stub.py / "
        "_pyrealsense2_stub.py) for the new calls, then regenerate the "
        "contract with `python -m tests._external_api --write`.\n"
        f"added: { {r: sorted(set(v) - set(contract.get(r, []))) for r, v in fresh.items()} }\n"
        f"removed: { {r: sorted(set(contract.get(r, [])) - set(v)) for r, v in fresh.items()} }"
    )


def _resolve(root_obj, chain_tail):
    obj = root_obj
    for part in chain_tail:
        obj = getattr(obj, part)
    return obj


def test_stubs_cover_vispy_contract(contract, monkeypatch):
    from tests import _vispy_stub

    vispy = _vispy_stub.install(monkeypatch)
    for chain in contract.get("vispy", []):
        _resolve(vispy, chain.split(".")[1:])


def test_stubs_cover_tkinter_contract(contract, monkeypatch):
    from tests import _tk_stub

    tk = _tk_stub.install(monkeypatch)
    for chain in contract.get("tkinter", []):
        # tkinter constants are stored lowercase in the stub but resolve
        # by the same attribute names the app uses
        _resolve(tk, chain.split(".")[1:])


def test_stubs_cover_pyrealsense2_contract(contract, monkeypatch):
    import sys

    from tests import _pyrealsense2_stub

    _pyrealsense2_stub.install(monkeypatch)
    pkg = sys.modules["pyrealsense2"]
    for chain in contract.get("pyrealsense2", []):
        _resolve(pkg, chain.split(".")[1:])


def test_surface_subset_of_reference(contract):
    if not REFERENCE.exists():
        pytest.skip("reference checkout not present")
    ours = {
        api.normalize(c) for chains in contract.values() for c in chains
    }
    ref = api.reference_surface(REFERENCE)
    extra = ours - ref - ADDITIONS_ALLOWLIST
    assert not extra, (
        "app code touches external API the reference never uses and that "
        f"is not allowlisted: {sorted(extra)} — verify each name against "
        "the REAL library documentation before allowlisting (the stubs "
        "cannot prove a name exists upstream)."
    )


def test_stub_top_level_surface_not_wider_than_contract(
    contract, monkeypatch
):
    """The stubs' public top-level names must all be contract-reachable
    (plus declared test helpers) — a stub growing speculative surface
    would mask missing coverage."""
    import sys

    from tests import _pyrealsense2_stub, _tk_stub, _vispy_stub

    helpers = {
        "vispy": {"used", "keys"},  # install-recorder + key constants
        # Widget is the stub's shared base class (not app surface)
        "tkinter": {"TclError", "END", "NSEW", "NW", "X", "Y", "VERTICAL",
                    "Widget"},
        "pyrealsense2": set(),
    }
    vispy = _vispy_stub.install(monkeypatch)
    tk = _tk_stub.install(monkeypatch)
    _pyrealsense2_stub.install(monkeypatch)
    rs_pkg = sys.modules["pyrealsense2"]
    for root, mod in (
        ("vispy", vispy),
        ("tkinter", tk),
        ("pyrealsense2", rs_pkg),
    ):
        first_level = {
            c.split(".")[1]
            for c in contract.get(root, [])
            if len(c.split(".")) > 1
        }
        public = {
            n
            for n in vars(mod)
            if not n.startswith("_")
            and n not in ("sys", "types", "np", "numpy")
        }
        extra = public - first_level - helpers[root]
        assert not extra, (root, sorted(extra))
