"""Fine-grained accounting of LFA level 0's non-KNN chain at 64k.

RESULTS.md's r3 per-stage table prices level 0 at ~29.7 ms = window-KNN
7.3 + two neighbour gathers ~7.5 + "fused chain, mlp1/mlp2/shortcut and
entry/exit sorts ~15 ms". This script decomposes that residual: each piece
timed standalone at the in-model shape (B=1, N=65536, K=32, half=8,
sorted domain), with random weights (the costs are shape-determined).

Usage: python benchmarks/ablate_l0_chain.py [N] [compute_dtype]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from recognizer3d_tpu.models import randlanet as rl
    from recognizer3d_tpu.ops import lfa_pallas
    from recognizer3d_tpu.ops.knn import gather_neighbors, knn_presorted
    from recognizer3d_tpu.ops.knn_pallas import invert_permutation, morton_order

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    K = 32
    half = 8
    c2 = 2 * half
    rng = np.random.RandomState(0)

    def t(name, make_fn, *args, iters=10, reps=3):
        dt = min(_device_time(make_fn, args, iters=iters) for _ in range(reps))
        print(f"{name:46s} {dt * 1000:9.2f} ms")
        return dt

    io = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    order = morton_order(xyz)
    inv = invert_permutation(order)
    xs = rl._sort_rows(xyz, order)
    feats_in = jnp.asarray(rng.randn(1, N, 8).astype(np.float32)).astype(io)
    neighbors, d2 = jax.jit(lambda x: knn_presorted(x, x, K, "approximate"))(xs)
    neighbors = jax.block_until_ready(neighbors)

    table = jnp.asarray(rng.randn(1, N, c2).astype(np.float32))
    gathered = jax.jit(gather_neighbors)(table, neighbors).astype(io)
    center = jnp.asarray(rng.randn(1, N, half).astype(np.float32))

    f32 = np.float32
    w9 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    b1 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    s1 = jnp.asarray(1 + 0.1 * rng.randn(half).astype(f32))
    o1 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    ws1 = jnp.asarray(rng.randn(c2, c2).astype(f32) * 0.3)
    wp1 = jnp.asarray(rng.randn(c2, half).astype(f32) * 0.3)
    bp1 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    sp1 = jnp.asarray(1 + 0.1 * rng.randn(half).astype(f32))
    op1 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    w2 = jnp.asarray(rng.randn(half, half).astype(f32) * 0.3)
    b2 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    s2 = jnp.asarray(1 + 0.1 * rng.randn(half).astype(f32))
    o2 = jnp.asarray(rng.randn(half).astype(f32) * 0.1)
    ws2 = jnp.asarray(rng.randn(c2, c2).astype(f32) * 0.3)
    wp2 = jnp.asarray(rng.randn(c2, c2).astype(f32) * 0.3)
    bp2 = jnp.asarray(rng.randn(c2).astype(f32) * 0.1)
    sp2 = jnp.asarray(1 + 0.1 * rng.randn(c2).astype(f32))
    op2 = jnp.asarray(rng.randn(c2).astype(f32) * 0.1)

    # ------------------------------------------------------------------
    # round 1 fused kernel standalone
    # ------------------------------------------------------------------
    def r1(c, g, d2_, ct):
        p1, r2 = lfa_pallas.lfa_round1_fused(
            g + c * jnp.asarray(1e-12, g.dtype), d2_, ct,
            w9, b1, s1, o1, ws1, wp1, bp1, sp1, op1, w2, b2, s2, o2,
        )
        return jnp.float32(
            jnp.sum(p1[:, :8].astype(jnp.float32))
            + jnp.sum(r2[:, :8].astype(jnp.float32))
        )

    t("round1 fused kernel", r1, gathered, d2, center)

    # ------------------------------------------------------------------
    # pool2 fused kernel standalone (inputs at its in-model shapes)
    # ------------------------------------------------------------------
    rpe2 = jnp.asarray(rng.randn(1, N, K * half).astype(f32)).astype(io)
    g2 = jnp.asarray(rng.randn(1, N, K, half).astype(f32)).astype(io)

    def p2(c, r2_, g2_):
        out = lfa_pallas.attentive_pool2_fused(
            r2_ + c * jnp.asarray(1e-12, r2_.dtype), g2_,
            ws2, wp2, bp2, sp2, op2, k=K,
        )
        return jnp.float32(jnp.sum(out.astype(jnp.float32)))

    t("pool2 fused kernel", p2, rpe2, g2)

    # ------------------------------------------------------------------
    # the surrounding XLA ops
    # ------------------------------------------------------------------
    mlp1 = rl.SharedMLP(half, activation="lrelu0.2", dtype=dtype, name="mlp1")
    v1 = mlp1.init(jax.random.PRNGKey(0), feats_in, train=False)

    def m1(c, f):
        out = mlp1.apply(v1, f + c * jnp.asarray(1e-12, f.dtype), train=False)
        return jnp.float32(jnp.sum(out.astype(jnp.float32)))

    t("mlp1 (8->8 SharedMLP)", m1, feats_in)

    rpe_mlp = rl.FusedRPEMLP(half, dtype=dtype, name="mlp_rpe1")
    g0 = jnp.asarray(rng.randn(1, N, K, half).astype(f32))
    dist0 = jnp.sqrt(jnp.maximum(d2, 0))
    vr = rpe_mlp.init(jax.random.PRNGKey(1), xs, g0, dist0, train=False)

    def proj(c, x, f):
        sup = rpe_mlp.apply(
            vr, x + c * 1e-12, method=rpe_mlp.support_projection
        )
        tab = jnp.concatenate([sup, f.astype(jnp.float32)], axis=-1)
        return jnp.float32(jnp.sum(tab))

    t("support_projection + table concat", proj, xs, feats_in)

    feats16 = jnp.asarray(rng.randn(1, N, c2).astype(f32)).astype(io)
    mlp2 = rl.SharedMLP(4 * half, dtype=dtype, name="mlp2")
    short = rl.SharedMLP(4 * half, dtype=dtype, name="shortcut")
    v2 = mlp2.init(jax.random.PRNGKey(2), feats16, train=False)
    v3 = short.init(jax.random.PRNGKey(3), feats_in, train=False)

    def resid(c, f, fi):
        a = mlp2.apply(v2, f + c * jnp.asarray(1e-12, f.dtype), train=False)
        b = short.apply(v3, fi, train=False)
        out = jax.nn.leaky_relu(a + b, negative_slope=0.01)
        return jnp.float32(jnp.sum(out.astype(jnp.float32)))

    t("mlp2 + shortcut + lrelu (16/8 -> 32)", resid, feats16, feats_in)

    feats32 = jnp.asarray(rng.randn(1, N, 4 * half).astype(f32)).astype(io)

    def sorts(c, f, o, i2):
        a = rl._sort_rows(f + c * jnp.asarray(1e-12, f.dtype), o)
        b = rl._sort_rows(a, i2)
        return jnp.float32(jnp.sum(b.astype(jnp.float32)))

    t("entry+exit row sorts (two 64k-row gathers)", sorts, feats32, order, inv)

    # ------------------------------------------------------------------
    # neighbour gathers standalone (the known ~row-gather-floor terms)
    # ------------------------------------------------------------------
    def gath(c, tab, nb):
        g = gather_neighbors(tab + c * 1e-12, nb)
        return jnp.float32(jnp.sum(g))

    t("combined gather (N,K,16) f32", gath, table, neighbors)

    pooled_tab = jnp.asarray(rng.randn(1, N, half).astype(f32)).astype(io)

    def gath2(c, tab8, nb):
        g = gather_neighbors(tab8 + c * jnp.asarray(1e-12, tab8.dtype), nb)
        return jnp.float32(jnp.sum(g.astype(jnp.float32)))

    t("gather2 (N,K,8)", gath2, pooled_tab, neighbors)

    # ------------------------------------------------------------------
    # window-KNN standalone (the routed "approximate" search at this N)
    # ------------------------------------------------------------------
    def wknn(c, x):
        xp = x + c * 1e-12
        nb, dd = knn_presorted(xp, xp, K, "approximate")
        return jnp.float32(jnp.sum(dd) + jnp.sum(nb[:, :128]))

    t("window-KNN self 64k (presorted)", wknn, xs)

    # ------------------------------------------------------------------
    # the ENTIRE level-0 body minus the KNN (in-model op sequence,
    # precomputed neighbors/d2) — what the block costs beyond the search
    # ------------------------------------------------------------------
    def chain(c, f_in, x, nb, dd, o, i2):
        # perturb x too so the support/center projections (and their d2
        # consumers) stay inside the timed loop — loop-invariant operands
        # would let XLA hoist those matmuls out of the fori_loop and
        # under-bill the chain (r3 advisor finding).
        x = x + c * 1e-12
        f_s = rl._sort_rows(f_in + c * jnp.asarray(1e-12, f_in.dtype), o)
        feats = mlp1.apply(v1, f_s, train=False)
        sup = rpe_mlp.apply(vr, x, method=rpe_mlp.support_projection)
        tab = jnp.concatenate([sup, feats.astype(jnp.float32)], axis=-1)
        g = gather_neighbors(tab, nb).astype(io)
        ctr = rpe_mlp.apply(vr, x, method=rpe_mlp.center_projection)
        p1, r2 = lfa_pallas.lfa_round1_fused(
            g, dd, ctr, w9, b1, s1, o1, ws1, wp1, bp1, sp1, op1,
            w2, b2, s2, o2,
        )
        g2_ = gather_neighbors(p1, nb)
        fo = lfa_pallas.attentive_pool2_fused(
            r2, g2_, ws2, wp2, bp2, sp2, op2, k=K
        )
        a = mlp2.apply(v2, fo, train=False)
        b = short.apply(v3, f_s, train=False)
        out = jax.nn.leaky_relu(a + b, negative_slope=0.01)
        out = rl._sort_rows(out, i2)
        return jnp.float32(jnp.sum(out.astype(jnp.float32)))

    t(
        "FULL level-0 body minus KNN (in-model seq)",
        chain, feats_in, xs, neighbors, d2, order, inv,
    )


if __name__ == "__main__":
    main()
