"""Shared device-timing helper for the benchmark scripts.

Through the axon TPU relay a single dispatch+readback costs ~40-80 ms wall
and ``block_until_ready`` does not reliably wait, so per-call timing is
meaningless. ``device_time`` chains iterations inside ONE jitted program
(each iteration's input perturbed by the carry so nothing is CSE'd away)
and forces a host readback.

The dispatch/readback overhead is cancelled with a TWO-POINT measurement:
the same chained loop compiled at ``iters`` and ``2·iters``, timed
repeatedly interleaved, per-iteration time = (t_2N − t_N) / iters taken
over the MINIMUM of each. The r3 approach (subtracting a separately-timed
trivial loop) over-subtracted whenever the relay RTT drifted between the
baseline probe and the measurement — an RTT spike during the baseline
made sub-ms stages read as 0.00 ms (r4 finding; the two-point form uses
the same program/transport for both points, so RTT noise cancels in the
difference and the min-over-reps rejects spikes).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def device_time(make_fn, args, iters=10, reps=3):
    """Device time per call of ``make_fn(c, *args)`` (the fn must fold its
    result into the returned f32 carry)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_loop(n):
        @jax.jit
        def loop(*args):
            def body(i, c):
                return make_fn(c, *args)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        return loop

    loop1 = make_loop(iters)
    loop2 = make_loop(2 * iters)
    float(loop1(*args))  # compile + warm
    float(loop2(*args))

    def once(loop):
        t0 = time.perf_counter()
        float(loop(*args))
        return time.perf_counter() - t0

    # interleave the two points so sustained RTT drift hits both equally
    # (timing all loop1 reps then all loop2 reps would re-admit the drift
    # bias the two-point form exists to cancel)
    samples = [(once(loop1), once(loop2)) for _ in range(reps)]
    t1 = min(s[0] for s in samples)
    t2 = min(s[1] for s in samples)
    return max((t2 - t1) / iters, 1e-9)
