"""Per-stage accounting of the `knn="approximate"` 64k forward (the
documented fast regime since the r3 exact-64k decision): each encoder LFA
level timed standalone at its in-model shape (sorted domain, real window
routing), plus the Morton setup, decoder sweep and head.

Usage: python benchmarks/ablate_approx_forward.py [N] [compute_dtype]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from recognizer3d_tpu.models import randlanet as rl
    from recognizer3d_tpu.models.settings import RandLANetSettings
    from recognizer3d_tpu.ops.knn_pallas import invert_permutation, morton_order

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    K = 32
    rng = np.random.RandomState(0)

    def t(name, make_fn, *args, iters=10, reps=3):
        dt = min(_device_time(make_fn, args, iters=iters) for _ in range(reps))
        print(f"{name:46s} {dt * 1000:9.2f} ms")
        return dt

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="approximate", n_points=N,
        n_neighbors=K, decimation=4, compute_dtype=dtype,
    )

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------
    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    net = rl.RandLANet(settings)
    variables = net.init(jax.random.PRNGKey(0), xyz, perm, train=False)

    def full(c, x, p):
        logits = net.apply(variables, x + c * 1e-12, p, train=False)
        return jnp.float32(jnp.sum(logits[:, :, :8]))

    total = t("FULL forward", full, xyz, perm, iters=5)

    # ------------------------------------------------------------------
    # encoder LFA levels at in-model shapes (sorted domain)
    # ------------------------------------------------------------------
    level_sizes = [N // settings.decimation**i for i in range(4)]
    in_ch = [8] + [2 * n for n in settings.layer_sizes[:-1]]
    lfa_times = []
    for i, (n_level, n_out) in enumerate(zip(level_sizes, settings.layer_sizes)):
        x = jnp.asarray(rng.randn(1, n_level, 3).astype(np.float32) * 0.2)
        order = morton_order(x)
        inv = invert_permutation(order)
        xs = rl._sort_rows(x, order)
        f = jnp.asarray(rng.randn(1, n_level, in_ch[i]).astype(np.float32))
        block = rl.LocalFeatureAggregation(
            n_out, K, "approximate", dtype=dtype, name=f"encoder_{i}"
        )
        bv = block.init(
            jax.random.PRNGKey(i), xs, f, train=False, order=order, inv_order=inv
        )

        def go(c, xs_, f_, o_, io_, _block=block, _bv=bv):
            out = _block.apply(
                _bv, xs_ + c * 1e-12, f_, train=False, order=o_, inv_order=io_
            )
            return jnp.float32(jnp.sum(out[:, :8].astype(jnp.float32)))

        lfa_times.append(
            t(f"LFA level {i} ({n_level} pts, out {2 * n_out})", go, xs, f, order, inv)
        )

    # ------------------------------------------------------------------
    # Morton setup (per-level orders + inversions + xyz sorts)
    # ------------------------------------------------------------------
    def setup(c, x):
        acc = jnp.float32(0.0)
        xp = x + c * 1e-12
        for i in range(5):
            n_level = N // settings.decimation**i
            xl = xp[:, :n_level]
            order = morton_order(xl)
            inv = invert_permutation(order)
            xs = rl._sort_rows(xl, order)
            acc = acc + jnp.float32(jnp.sum(xs[:, :4])) + jnp.float32(
                jnp.sum(inv[:4])
            )
        return acc

    t("Morton setup (5 levels: order+inv+sort)", setup, xyz)

    # ------------------------------------------------------------------
    # decoder sweep (upsample_nni + concat + transpose MLP, 4 stages)
    # ------------------------------------------------------------------
    class Decoder(nn.Module):
        @nn.compact
        def __call__(self, feats, xyz_levels, orders, invs, skips):
            n_outs = list(settings.layer_sizes[::-1][1:])
            channels = [2 * n for n in n_outs] + [8]
            for i, n_out_ch in enumerate(channels):
                level = 4 - i
                upsampled = rl.upsample_nni(
                    rl._sort_rows(feats, orders[level]),
                    xyz_levels[level],
                    xyz_levels[level - 1],
                    "approximate",
                    inv_fine=invs[level - 1],
                )
                feats = jnp.concatenate([upsampled, skips[3 - i]], axis=-1)
                feats = rl.SharedMLP(
                    n_out_ch, activation="relu", init_fan=n_out_ch,
                    dtype=dtype, name=f"decoder_{i}",
                )(feats, train=False)
            return feats

    sizes5 = level_sizes + [level_sizes[-1] // settings.decimation]
    xyz_levels, orders, invs = [], [], []
    for n_level in sizes5:
        x = jnp.asarray(rng.randn(1, n_level, 3).astype(np.float32) * 0.2)
        o = morton_order(x)
        orders.append(o)
        invs.append(invert_permutation(o))
        xyz_levels.append(rl._sort_rows(x, o))
    skips = [
        jnp.asarray(rng.randn(1, n, 2 * c).astype(np.float32))
        for n, c in zip(level_sizes, settings.layer_sizes)
    ]
    bottleneck = jnp.asarray(rng.randn(1, sizes5[-1], 512).astype(np.float32))
    dec = Decoder()
    dv = dec.init(
        jax.random.PRNGKey(9), bottleneck, xyz_levels, orders, invs, skips
    )

    def dgo(c, f, *rest):
        out = dec.apply(dv, f + c * 1e-12, xyz_levels, orders, invs, skips)
        return jnp.float32(jnp.sum(out[:, :8].astype(jnp.float32)))

    t("decoder (4 x upsample+concat+MLP)", dgo, bottleneck)

    # ------------------------------------------------------------------
    # head: fc_end chain at N + final inverse-permutation sort
    # ------------------------------------------------------------------
    class Head(nn.Module):
        @nn.compact
        def __call__(self, feats, perm):
            feats = rl._sort_rows(feats, invert_permutation(perm))
            feats = rl.SharedMLP(64, activation="relu", dtype=dtype, name="fc_end_0")(
                feats, train=False
            )
            feats = rl.SharedMLP(32, activation="relu", dtype=dtype, name="fc_end_1")(
                feats, train=False
            )
            feats = rl.SharedMLP(2, bn=False, dtype=dtype, name="fc_end_2")(
                feats, train=False
            )
            return jnp.swapaxes(feats, -1, -2).astype(jnp.float32)

    f8 = jnp.asarray(rng.randn(1, N, 8).astype(np.float32))
    head = Head()
    hv = head.init(jax.random.PRNGKey(11), f8, perm)

    def hgo(c, f, p):
        out = head.apply(hv, f + c * 1e-12, p)
        return jnp.float32(jnp.sum(out[:, :, :8]))

    t("head (inv-perm sort + fc_end chain)", hgo, f8, perm)

    print(
        f"\nsum(LFA levels) = {sum(lfa_times) * 1000:.2f} ms of "
        f"{total * 1000:.2f} ms total"
    )


if __name__ == "__main__":
    main()
