"""Where does batch scaling break at 64k? Times each stage at B=1 and
B=4 and reports the scaling factor (ideal = 4.0).

Usage: python benchmarks/ablate_batch.py [N] [B]
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
    from recognizer3d_tpu.ops.knn import gather_neighbors
    from recognizer3d_tpu.ops.knn_pallas import knn_pallas, morton_codes

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.2)
    x1 = xb[:1]
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    idxb = jnp.asarray(rng.randint(0, N, (B, N, 32)).astype(np.int32))
    featsb = jnp.asarray(rng.randn(B, N, 32).astype(np.float32))

    def t2(name, make_fn, args1, argsb, iters=6):
        t1 = _device_time(make_fn, args1, iters=iters)
        tb = _device_time(make_fn, argsb, iters=max(2, iters // 2))
        print(
            f"{name:40s} B=1 {t1 * 1e3:8.2f} ms   B={B} {tb * 1e3:8.2f} ms"
            f"   scale {tb / t1:5.2f}x"
        )

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=N,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, seed=0)

    def fwd(c, variables, x, p):
        return jnp.float32(
            jnp.max(model._forward_jit(variables, x + c * 1e-12, p))
        )

    t2(
        "full forward", fwd,
        (model.variables, x1, perm), (model.variables, xb, perm), iters=4,
    )

    def go_knn(c, x):
        idx, d2 = knn_pallas(x + c * 1e-12, x + c * 1e-12, 32)
        return jnp.float32(jnp.sum(d2[:, :8, :1]))

    t2("knn_pallas k=32", go_knn, (x1,), (xb,))

    def go_sort(c, x):
        o = jnp.argsort(morton_codes(x + c * 1e-12), axis=1)
        return jnp.float32(jnp.sum(o[:, :8]))

    t2("morton argsort", go_sort, (x1,), (xb,))

    def go_gather(c, f, idx):
        out = gather_neighbors(f + c * 1e-12, idx)
        return jnp.float32(jnp.sum(out[:, :8]))

    t2(
        "gather_neighbors C=32", go_gather,
        (featsb[:1], idxb[:1]), (featsb, idxb),
    )

    def go_taa(c, d2, inv):
        out = jnp.take_along_axis(d2 + c * 1e-12, inv, axis=1)
        return jnp.float32(jnp.sum(out[:, :8]))

    t2(
        "take_along_axis rows", go_taa,
        (featsb[:1], idxb[:1, :, :1]), (featsb, idxb[:, :, :1]),
    )


if __name__ == "__main__":
    main()
