"""A/B the fused eval-mode LFA kernels (ops/lfa_pallas.py) on the full
64k exact forward: RECOGNIZER3D_FUSED_LFA toggles the fused path per
process, so this script times one configuration — run it twice.

Usage: RECOGNIZER3D_FUSED_LFA={0,1} python benchmarks/ablate_lfa_fused.py \
           [N] [reps] [compute_dtype] [knn]
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.models.settings import RandLANetSettings
    from recognizer3d_tpu.models.facade import Model

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    knn = sys.argv[4] if len(sys.argv) > 4 else "naive"
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn=knn, n_points=N,
        n_neighbors=32, decimation=4, compute_dtype=dtype,
    )
    model = Model(settings, seed=0)

    def fwd(c, variables, x, p):
        return jnp.float32(
            jnp.max(model._forward_jit(variables, x + c * 1e-12, p))
        )

    mode = os.environ.get("RECOGNIZER3D_FUSED_LFA", "1")
    for r in range(reps):
        dt = _device_time(fwd, (model.variables, xyz, perm), iters=10)
        print(
            f"fused={mode} dtype={dtype} knn={knn} rep{r}: "
            f"full forward {dt * 1000:8.2f} ms"
        )


if __name__ == "__main__":
    main()
