"""Ablate the 64k forward pass: time each suspected cost center in
isolation with the chained-iteration device-timing method from bench.py.

Usage: python benchmarks/ablate_forward.py [N]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu.models.settings import RandLANetSettings
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.ops.knn_pallas import (
        argmin_pallas,
        invert_permutation,
        knn_pallas,
        morton_codes,
    )
    from recognizer3d_tpu.ops.knn import gather_neighbors

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    feats = jnp.asarray(rng.randn(1, N, 32).astype(np.float32))

    def t(name, make_fn, *args, iters=10):
        dt = _device_time(make_fn, args, iters=iters)
        print(f"{name:42s} {dt * 1000:9.2f} ms")
        return dt

    # full forward
    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=N,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, seed=0)

    def fwd(c, variables, x, p):
        return jnp.float32(
            jnp.max(model._forward_jit(variables, x + c * 1e-12, p))
        )

    t("full forward", fwd, model.variables, xyz, perm)

    # KNN at each encoder level
    for lvl in range(4):
        n = N // 4**lvl
        x = xyz[:, :n]

        def go(c, x):
            idx, d2 = knn_pallas(x + c * 1e-12, x + c * 1e-12, 32)
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        t(f"self-KNN k=32 @ {n}", go, x)

    # decoder 1-NN levels
    for lvl in range(4):
        ns, nq = N // 4 ** (lvl + 1), N // 4**lvl

        def go(c, s, q):
            idx, d2 = argmin_pallas(s + c * 1e-12, q + c * 1e-12)
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        t(f"1-NN {ns} -> {nq}", go, xyz[:, :ns], xyz[:, :nq])

    # morton sort alone
    def go_sort(c, x):
        o = jnp.argsort(morton_codes(x + c * 1e-12), axis=1)
        return jnp.float32(jnp.sum(o[:, :8]))

    t(f"morton argsort @ {N}", go_sort, xyz)

    # invert permutation: argsort vs scatter
    def go_argsort_inv(c, p):
        return jnp.float32(jnp.sum(jnp.argsort(p + (c * 0).astype(p.dtype))[:8]))

    def go_scatter_inv(c, p):
        return jnp.float32(
            jnp.sum(invert_permutation(p + (c * 0).astype(p.dtype))[:8])
        )

    t(f"argsort-inverse @ {N}", go_argsort_inv, perm)
    t(f"scatter-inverse @ {N}", go_scatter_inv, perm)

    # index remap gather (s_order[idx]) — 2M scalar lookups at 64k
    idx = jnp.asarray(rng.randint(0, N, (1, N, 32)).astype(np.int32))

    def go_remap(c, order, idx):
        out = jax.vmap(lambda o, i: o[i])(order + (c * 0).astype(order.dtype), idx)
        return jnp.float32(jnp.sum(out[:, :8]))

    t(f"idx remap order[idx] @ {N}x32", go_remap, perm[None], idx)

    # neighbour feature row gather
    def go_gather(c, f, idx):
        out = gather_neighbors(f + c * 1e-12, idx)
        return jnp.float32(jnp.sum(out[:, :8]))

    t(f"gather_neighbors (C=32) @ {N}x32", go_gather, feats, idx)

    # take_along_axis unsort of (B, N, 32)
    def go_taa(c, d2, inv):
        out = jnp.take_along_axis(d2 + c * 1e-12, inv[..., None], axis=1)
        return jnp.float32(jnp.sum(out[:, :8]))

    d2 = jnp.asarray(rng.rand(1, N, 32).astype(np.float32))
    t(f"take_along_axis unsort @ {N}x32", go_taa, d2, perm[None])

    # ---- LFA non-KNN internals at level 0 (N x K=32) -------------------
    from recognizer3d_tpu.models.randlanet import (
        AttentivePooling,
        LocalFeatureAggregation,
        SharedMLP,
        relative_position_encoding,
    )

    # full LFA block with fixed neighbour indices (isolates the non-KNN part
    # when compared against the self-KNN rows above)
    lfa = LocalFeatureAggregation(32, 32, "naive")
    feats8 = jnp.asarray(rng.randn(1, N, 8).astype(np.float32))
    lfa_vars = lfa.init(jax.random.PRNGKey(0), xyz[:, :4096], feats8[:, :4096])

    def go_lfa(c, v, x, f):
        out = lfa.apply(v, x + c * 1e-12, f)
        return jnp.float32(jnp.max(out))

    t("LFA level0 full (incl KNN)", go_lfa, lfa_vars, xyz, feats8)

    # attentive pooling alone on (1, N, 32, 16)
    ap = AttentivePooling(16)
    x4 = jnp.asarray(rng.randn(1, N, 32, 16).astype(np.float32))
    ap_vars = ap.init(jax.random.PRNGKey(0), x4[:, :1024])

    def go_ap(c, v, x):
        return jnp.float32(jnp.max(ap.apply(v, x + c * 1e-12)))

    t("AttentivePooling (N,32,16)", go_ap, ap_vars, x4)

    # SharedMLP on (1, N, 32, 10) -> 16 (the rpe mlp)
    sm = SharedMLP(16, activation="relu")
    x10 = jnp.asarray(rng.randn(1, N, 32, 10).astype(np.float32))
    sm_vars = sm.init(jax.random.PRNGKey(0), x10[:, :1024])

    def go_sm(c, v, x):
        return jnp.float32(jnp.max(sm.apply(v, x + c * 1e-12)))

    t("SharedMLP (N,32,10)->16", go_sm, sm_vars, x10)

    # rpe construction (concat of center/neighbor/diff/dist)
    nb_xyz = jnp.asarray(rng.randn(1, N, 32, 3).astype(np.float32))
    dists = jnp.asarray(rng.rand(1, N, 32).astype(np.float32))

    def go_rpe(c, x, nb, d):
        out = relative_position_encoding(x + c * 1e-12, None, d, nb)
        return jnp.float32(jnp.max(out))

    t("RPE concat (N,32,10)", go_rpe, xyz, nb_xyz, dists)


if __name__ == "__main__":
    main()
