"""Decompose the Morton-window KNN's cost at the 64k self-KNN shape.

ablate_l0_chain.py measured the routed `knn="approximate"` search at 64k
(window 4096, qb 512) at ~16 ms with full output consumption — level 0's
single largest term. This script splits that into (a) the windowed d2
computation, (b) the `approx_min_k` selection, (c) windowing overhead,
and prices variants: query-block / group sizes, bf16 selection input,
recall_target.

Usage: python benchmarks/ablate_window_knn.py [N]
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

    from recognizer3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from recognizer3d_tpu.ops.knn import _pairwise_sq_dists, knn_window
    from recognizer3d_tpu.ops.knn_pallas import morton_order

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = 32
    rng = np.random.RandomState(0)
    # the inline win_variant below deliberately skips knn_window's
    # ceil-divide padding / center clamp, so it is only equivalent to the
    # shipped kernel at sizes divisible by qb*g for every variant swept
    # here (qb up to 1024, g up to N//qb).
    assert N % 8192 == 0, (
        f"N={N} must be a multiple of 8192 (= max qb 1024 x min g 8 swept "
        "here); the inline variant has no padding path"
    )

    def t(name, make_fn, *args, iters=10, reps=3):
        dt = min(_device_time(make_fn, args, iters=iters) for _ in range(reps))
        print(f"{name:52s} {dt * 1000:9.2f} ms")
        return dt

    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    order = morton_order(xyz)
    xs = jnp.take_along_axis(xyz, order[..., None], axis=1)

    def win_variant(
        x,
        qb=512,
        g=16,
        w=4096,
        sel="approx",
        sel_dtype=None,
        recall=0.95,
    ):
        """Inline parameterized copy of ops/knn.knn_window's presorted core."""
        B, n, _ = x.shape
        m = n
        n_blocks = m // qb
        centers = (np.arange(n_blocks) + 0.5) * qb * (n / m)
        starts = np.clip(
            np.round(centers - w / 2), 0, n - w
        ).astype(np.int32)
        starts_j = jnp.asarray(starts)
        blocks = x.reshape(B, n_blocks, qb, 3)

        def batch_run(s_b, blocks_b):
            def group_run(args):
                qblk, start = args
                win = jax.vmap(
                    lambda st: lax.dynamic_slice(s_b, (st, 0), (w, 3))
                )(start)
                d2 = _pairwise_sq_dists(qblk, win)
                if sel_dtype is not None:
                    d2 = d2.astype(sel_dtype)
                if sel == "none":
                    # d2-only probe: bill the distance computation alone
                    return (
                        jnp.sum(d2.astype(jnp.float32), axis=-1)[..., None],
                        jnp.max(d2.astype(jnp.float32), axis=-1)[..., None],
                    )
                vals, idx = lax.approx_min_k(d2, K, recall_target=recall)
                return idx.astype(jnp.int32) + start[:, None, None], jnp.maximum(
                    vals.astype(jnp.float32), 0.0
                )

            n_groups = n_blocks // g
            idx, d2 = lax.map(
                group_run,
                (
                    blocks_b.reshape(n_groups, g, qb, 3),
                    starts_j.reshape(n_groups, g),
                ),
            )
            kk = idx.shape[-1]
            return (
                idx.reshape(n_groups * g * qb, kk),
                d2.reshape(n_groups * g * qb, kk),
            )

        return jax.vmap(batch_run)(x, blocks)

    def probe(fn):
        def run(c, x):
            idx, d2 = fn(x + c * 1e-12)
            return jnp.float32(
                jnp.sum(d2) + jnp.sum(jnp.float32(idx[:, :128]))
            )

        return run

    # the shipped routing (ops/knn.knn_window presorted)
    t(
        "knn_window shipped (qb512 g16 w4096 f32)",
        probe(lambda x: knn_window(x, x, K, presorted=True)),
        xs,
    )
    # same, via the inline copy (sanity: should match)
    t("inline copy (qb512 g16 w4096 f32)", probe(win_variant), xs)
    # d2 computation only (no selection)
    t(
        "  d2 compute only (no approx_min_k)",
        probe(lambda x: win_variant(x, sel="none")),
        xs,
    )
    # selection input in bf16 (halves approx_min_k's input traffic)
    t(
        "  bf16 selection input",
        probe(lambda x: win_variant(x, sel_dtype=jnp.bfloat16)),
        xs,
    )
    # block-size / grouping sweeps
    t("  qb 1024, g 8", probe(lambda x: win_variant(x, qb=1024, g=8)), xs)
    t("  qb 256, g 32", probe(lambda x: win_variant(x, qb=256, g=32)), xs)
    t("  g 4 (32 blocks/group)", probe(lambda x: win_variant(x, g=4)), xs)
    t("  g 64 (2 groups)", probe(lambda x: win_variant(x, g=64)), xs)
    t(
        "  one group (no lax.map)",
        probe(lambda x: win_variant(x, g=N // 512)),
        xs,
    )
    # recall target
    t(
        "  recall_target 0.9",
        probe(lambda x: win_variant(x, recall=0.9)),
        xs,
    )
    # bf16 + qb1024 combined
    t(
        "  bf16 + qb1024 g8",
        probe(lambda x: win_variant(x, qb=1024, g=8, sel_dtype=jnp.bfloat16)),
        xs,
    )


if __name__ == "__main__":
    main()
