"""Price windowed neighbour gathers against the flat row gather.

Window-KNN indices are confined by construction to a ``w``-point Morton
window per query block (static per-block starts — ops/knn.knn_window), so
the (M·K)-row gather that follows every approximate-path KNN could run
against 4096-row tables (VMEM-sized) instead of the full N-row table whose
DRAM-page footprint sets the ~2.4 ns/row rate (RESULTS.md "Batched row
gathers"). This script prices the candidate formulations at the in-model
level-0 shape before any rewiring:

  A. flat        — jnp.take from the (N, C) table (current gather_neighbors)
  B. map-slice   — lax.map over query blocks: dynamic_slice the (w, C)
                   window, take the block's (qb·K) local indices
  C. grouped     — same, vmapped over groups of blocks (knn_window's
                   dispatch shape)
  D. pre-window  — materialise all (n_blocks, w, C) windows with ONE flat
                   row gather (n_blocks·w rows), then take_along_axis per
                   block (batched gather from VMEM-sized tables)
  E. onehot-bf16 — per block, gather = one_hot(local, w) @ window on the
                   MXU (bf16 data; exact for the 0/1 matrix)

Usage: python benchmarks/ablate_window_gather.py [N] [C]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = 32
    QB = 512
    W = 4096
    rng = np.random.RandomState(0)

    n_blocks = N // QB
    # window starts exactly as knn_window computes them (self-KNN: m == n)
    centers = np.minimum((np.arange(n_blocks) + 0.5) * QB, N - 0.5)
    starts = np.clip(np.round(centers - W / 2), 0, N - W).astype(np.int32)
    # window-local neighbour indices, globalised
    local = rng.randint(0, W, size=(n_blocks, QB, K)).astype(np.int32)
    idx_global = jnp.asarray((local + starts[:, None, None]).reshape(N, K))
    idx_local = jnp.asarray(local)
    starts_j = jnp.asarray(starts)
    table = jnp.asarray(rng.randn(N, C).astype(np.float32))

    def t(name, make_fn, args, iters=20, reps=3):
        dt = min(_device_time(make_fn, args, iters=iters) for _ in range(reps))
        print(f"{name:34s} {dt * 1000:8.3f} ms")
        return dt

    def probe(g):
        return jnp.float32(jnp.sum(g[:1024].astype(jnp.float32)))

    # A. flat row gather (current production path)
    def flat(c, tbl, idx):
        g = jnp.take(tbl + c * 1e-12, idx.reshape(-1), axis=0)
        return probe(g.reshape(N * K, C))

    t("A flat take (N-row table)", flat, (table, idx_global))

    # B. lax.map over blocks: slice window, local take
    def map_slice(c, tbl, loc):
        tblc = tbl + c * 1e-12

        def one(args):
            lo, st = args
            win = lax.dynamic_slice(tblc, (st, 0), (W, C))
            return jnp.take(win, lo.reshape(-1), axis=0)

        g = lax.map(one, (loc, starts_j))
        return probe(g.reshape(N * K, C))

    t("B map-slice per block", map_slice, (table, idx_local))

    # C. grouped: map over groups of 16 blocks, vmap inside
    G = 16

    def grouped(c, tbl, loc):
        tblc = tbl + c * 1e-12

        def group(args):
            lo, st = args  # (G, QB, K), (G,)
            win = jax.vmap(lambda s: lax.dynamic_slice(tblc, (s, 0), (W, C)))(
                st
            )
            return jax.vmap(lambda w_, l_: jnp.take(w_, l_.reshape(-1), 0))(
                win, lo
            )

        g = lax.map(
            group,
            (loc.reshape(n_blocks // G, G, QB, K), starts_j.reshape(-1, G)),
        )
        return probe(g.reshape(N * K, C))

    t("C grouped map (G=16)", grouped, (table, idx_local))

    # D. materialise windows once (one flat gather), batched local take
    win_rows = jnp.asarray(
        (starts[:, None] + np.arange(W)[None, :]).reshape(-1)
    )

    def prewin(c, tbl, loc):
        wins = jnp.take(tbl + c * 1e-12, win_rows, axis=0).reshape(
            n_blocks, W, C
        )
        g = jax.vmap(lambda w_, l_: jnp.take(w_, l_.reshape(-1), 0))(wins, loc)
        return probe(g.reshape(N * K, C))

    t("D pre-window + batched take", prewin, (table, idx_local))

    # E. one-hot bf16 matmul per block group
    def onehot(c, tbl, loc):
        tblc = (tbl + c * 1e-12).astype(jnp.bfloat16)

        def group(args):
            lo, st = args
            win = jax.vmap(lambda s: lax.dynamic_slice(tblc, (s, 0), (W, C)))(
                st
            )  # (G, W, C)
            oh = jax.nn.one_hot(
                lo.reshape(G, QB * K), W, dtype=jnp.bfloat16
            )  # (G, QB*K, W)
            return jnp.einsum(
                "gqw,gwc->gqc",
                oh,
                win,
                preferred_element_type=jnp.float32,
            )

        g = lax.map(
            group,
            (loc.reshape(n_blocks // G, G, QB, K), starts_j.reshape(-1, G)),
        )
        return probe(g.reshape(N * K, C))

    t("E one-hot bf16 MXU", onehot, (table, idx_local))

    # correctness cross-check of the windowed formulations
    ref = np.asarray(jnp.take(table, idx_global.reshape(-1), axis=0))
    got_b = np.asarray(
        jax.vmap(
            lambda lo, st: jnp.take(
                lax.dynamic_slice(table, (st, 0), (W, C)), lo.reshape(-1), 0
            )
        )(idx_local, starts_j)
    ).reshape(-1, C)
    assert np.array_equal(ref, got_b), "windowed gather mismatch"
    print("windowed == flat: ok")


if __name__ == "__main__":
    main()
