"""A/B the r4 sorted-domain flow (inter-level permutation composition +
residual-fused pool2) against the r3 per-level-sort flow, in ONE process
so relay/CPU conditions are identical (the flow switch is trace-time:
RECOGNIZER3D_SORTED_FLOW).

Usage: python benchmarks/ablate_sorted_flow.py [N] [knn]
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    knn = sys.argv[2] if len(sys.argv) > 2 else "approximate"
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))

    def t(name, model, iters=10):
        def fwd(c, variables, x, perm):
            logits = model._forward_jit(variables, x + c * 1e-12, perm)
            return jnp.float32(jnp.max(logits))

        args = (model.variables, x, perm)
        # device_time already min-of-reps internally — no outer reps
        # (each call re-traces both loops; tripling it buys nothing)
        dt = _device_time(fwd, args, iters=iters)
        print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
        return dt

    results = {}
    for dtype in ("float32", "bfloat16"):
        for flow, label in (("0", "r3 per-level sorts"), ("1", "r4 sorted")):
            os.environ["RECOGNIZER3D_SORTED_FLOW"] = flow
            model = Model(
                RandLANetSettings(
                    n_classes=2, n_features=0, knn=knn, n_points=N,
                    n_neighbors=32, decimation=4, compute_dtype=dtype,
                ),
                seed=0,
            )
            results[(dtype, flow)] = t(
                f"{knn} {dtype} [{label}]", model
            )
    os.environ.pop("RECOGNIZER3D_SORTED_FLOW", None)
    for dtype in ("float32", "bfloat16"):
        old, new = results[(dtype, "0")], results[(dtype, "1")]
        print(
            f"{dtype}: {old * 1e3:.2f} -> {new * 1e3:.2f} ms "
            f"({(old - new) * 1e3:+.2f} ms, {old / new:.3f}x)"
        )


if __name__ == "__main__":
    main()
