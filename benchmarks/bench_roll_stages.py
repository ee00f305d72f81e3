"""Microbenchmark: cost of one roll-based compare-exchange stage on a
(QB, TS) VMEM tile inside a pallas kernel — decides whether a bitonic
tournament merge can beat repeated min-extraction in the KNN kernel.

Runs a kernel that applies S stages of: partner = x[i XOR d] via two rolls
+ select, then min/max/direction-select (the exact op mix of a bitonic
stage, payload riding along), over a grid of n_blocks programs.

Usage: python benchmarks/bench_roll_stages.py
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stage(vals, pays, lane, d, kk):
    """One bitonic compare-exchange stage with payload.

    Mosaic-safe: no boolean-boolean ops (i1 arithmetic crashes the
    truncation pass) — the keep-min predicate is computed as int32 bit
    arithmetic and every select conditions on a single comparison."""
    w = vals.shape[1]
    up = pltpu.roll(vals, w - d, 1)  # brings x[i+d] to lane i
    dn = pltpu.roll(vals, d, 1)
    pup = pltpu.roll(pays, w - d, 1)
    pdn = pltpu.roll(pays, d, 1)
    low = (lane & d) == 0
    partner = jnp.where(low, up, dn)
    ppartner = jnp.where(low, pup, pdn)
    # keep_min = (bit_d == 0) XOR (bit_kk != 0), as int32 arithmetic
    bit_d = (lane & d) // d
    bit_kk = (lane & kk) // kk
    keep_min = (1 - bit_d) ^ bit_kk  # 1 -> this lane keeps the min
    cmp = vals <= partner
    mn = jnp.where(cmp, vals, partner)
    mx = jnp.where(cmp, partner, vals)
    pmn = jnp.where(cmp, pays, ppartner)
    pmx = jnp.where(cmp, ppartner, pays)
    new_vals = jnp.where(keep_min == 1, mn, mx)
    new_pays = jnp.where(keep_min == 1, pmn, pmx)
    return new_vals, new_pays


def _kernel(x_ref, o_ref, *, stages, ts):
    qb = x_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (qb, ts), 1)
    vals = x_ref[0]
    pays = lane
    # realistic mix: alternate a few distances so the compiler can't fold
    d_seq = [1, 2, 4, 8, 16, 32][: max(1, min(6, stages))]
    for s in range(stages):
        d = d_seq[s % len(d_seq)]
        vals, pays = _stage(vals, pays, lane, d, 32)
    o_ref[0] = vals + pays.astype(jnp.float32) * 1e-12


def run(stages, qb=128, ts=1024, n_blocks=512, iters=5):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n_blocks, qb, ts).astype(np.float32))

    f = pl.pallas_call(
        functools.partial(_kernel, stages=stages, ts=ts),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, qb, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, qb, ts), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, qb, ts), jnp.float32),
    )

    @jax.jit
    def loop(x):
        def body(i, c):
            return c + jnp.max(f(x + c * 1e-12)[:, :1, :1])

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(x))
    t0 = time.perf_counter()
    float(loop(x))
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    base = run(1)
    for stages in [1, 5, 15, 45]:
        dt = run(stages)
        per_block = dt / 512 * 1e6
        per_stage = (dt - base) / 512 / max(1, stages - 1) * 1e6
        print(
            f"stages={stages:3d}  total {dt * 1000:7.2f} ms  "
            f"per-block {per_block:7.2f} us  marginal/stage {per_stage:6.3f} us"
        )


if __name__ == "__main__":
    main()
