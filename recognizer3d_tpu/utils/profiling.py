"""Profiling / warmup utilities.

The reference's only perf tooling is tqdm bars and a manual warmup predict
("first prediction is always much slower", predict.py:22-24 — SURVEY.md §5.1).
TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory;
- :func:`warmup` — compile + execute once with a forced host readback (jit
  compile is the reference's "first prediction" cost);
- :func:`timeit` / :func:`timeit_amortized` — wall-clock timing that forces
  host readbacks. NOTE: through the axon TPU relay ``block_until_ready`` does
  not reliably wait, so only value dependencies measure truthfully.
"""

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _readback(out) -> float:
    leaves = jax.tree_util.tree_leaves(out)
    return sum(float(jnp.sum(leaf)) for leaf in leaves if hasattr(leaf, "sum"))


def warmup(fn: Callable, *args, **kwargs):
    """Run fn once (triggering jit compilation) and wait for the result."""
    out = fn(*args, **kwargs)
    _readback(out)
    return out


def timeit(fn: Callable, *args, iters: int = 10, warmup_iters: int = 2) -> float:
    """Median per-call wall time including dispatch + readback."""
    for _ in range(warmup_iters):
        _readback(fn(*args))
    times = []
    for _ in range(iters):
        t = time.perf_counter()
        _readback(fn(*args))
        times.append(time.perf_counter() - t)
    return float(np.median(times))


def timeit_amortized(fn: Callable, *args, iters: int = 20) -> float:
    """Amortized per-call device time: dispatch ``iters`` calls, then drain —
    hides the per-call relay RTT to expose device throughput."""
    _readback(fn(*args))
    t = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        _readback(o)
    return (time.perf_counter() - t) / iters
