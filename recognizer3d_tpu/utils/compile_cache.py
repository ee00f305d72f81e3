"""Persistent XLA compilation cache.

Remote TPU compiles of the full training/eval programs take minutes; the
compiled executables are deterministic in (program, compiler version,
device), so every run after the first can load them from disk instead.
This module turns on JAX's persistent compilation cache with a per-user
default directory. The reference has no equivalent (torch eager pays no
compile, but its CPU epoch is ~2495 s — benchmarks/baseline_cpu.json);
here the cache is what makes the "single-epoch fine-tune" headline hold
on warm starts: the 50-epoch app recipe drops from ~11.5 min (cold,
compile-dominated) to the ~1.4 s/epoch steady state.

Disable with ``RECOGNIZER3D_COMPILE_CACHE=0`` or point the directory
elsewhere with ``RECOGNIZER3D_COMPILE_CACHE=/path``.
"""

import logging
import os
from pathlib import Path

logger = logging.getLogger("compile_cache")

_DEFAULT_DIR = Path.home() / ".cache" / "recognizer3d_tpu" / "xla_cache"
_enabled = False


def enable_persistent_cache(cache_dir: os.PathLike = None) -> bool:
    """Point XLA's compilation cache at a persistent directory (idempotent).

    Safe to call any time after import — cache settings apply to future
    compilations only. Returns True if the cache is active. Call this in
    every PROCESS that compiles (the training worker is spawned, so the
    CLI-side call does not carry over).
    """
    global _enabled
    env = os.environ.get("RECOGNIZER3D_COMPILE_CACHE", "")
    if env == "0":
        return False
    if _enabled and cache_dir is None:
        return True
    path = Path(cache_dir or env or _DEFAULT_DIR)
    try:
        import jax

        if cache_dir is None and jax.default_backend() == "cpu":
            # the cache exists to amortize minutes-long remote TPU
            # compiles; CPU compiles are fast and XLA:CPU's AOT loader
            # warns on cross-machine feature mismatches. Opt in with an
            # explicit directory (or the env var) if wanted.
            return False
        path.mkdir(parents=True, exist_ok=True)
        # the cache module memoizes its enabled/dir state at first use;
        # if anything compiled before this call, re-point it explicitly
        from jax._src import compilation_cache as _cc

        jax.config.update("jax_compilation_cache_dir", str(path))
        if _cc.is_initialized():
            _cc.reset_cache()
        # cache everything: the big programs are minutes, but even the
        # small dispatch helpers add up through the remote relay
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        logger.debug(f"persistent compilation cache at {path}")
    except Exception as exc:  # best-effort: never fail the caller
        logger.warning(f"persistent compilation cache unavailable: {exc}")
        return False
    return True
