"""Shared device-timing helper for the benchmark scripts.

Through the axon TPU relay a single dispatch+readback costs ~40-80 ms wall
and ``block_until_ready`` does not reliably wait, so per-call timing is
meaningless. ``device_time`` chains ``iters`` iterations inside ONE jitted
program (each iteration's input perturbed by the carry so nothing is CSE'd
away), forces a host readback, and subtracts the measured dispatch/readback
overhead — what a production host driving the chip directly would see.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def device_time(make_fn, args, iters=10):
    """Median-free single-shot device time per call of ``make_fn(c, *args)``
    (the fn must fold its result into the returned f32 carry)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(*args):
        def body(i, c):
            return make_fn(c, *args)

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @jax.jit
    def loop0(x):
        def body(i, c):
            return c + x

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    float(loop0(jnp.float32(1.0)))
    t0 = time.perf_counter()
    float(loop0(jnp.float32(1.0)))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(*args))
    return max((time.perf_counter() - t0 - overhead) / iters, 1e-9)
