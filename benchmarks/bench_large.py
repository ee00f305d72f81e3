"""Large-scene stretch benchmark (BASELINE.json config 5): 1M-point
S3DIS-style clouds through the tiled/HBM Pallas KNN and the decimation
hierarchy. Standalone (not part of bench.py's driver line — the compile
alone takes minutes).

Usage: python benchmarks/bench_large.py [n_points]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(n_points: int = 1_048_576):
    import jax
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.RandomState(0)
    cloud = jnp.asarray(rng.rand(1, n_points, 3).astype(np.float32))

    f = jax.jit(lambda s, q: knn_pallas(s, q, 32))
    out = f(cloud, cloud)
    _ = float(jnp.sum(out[1]))  # compile + run
    times = []
    for _i in range(3):
        t = time.perf_counter()
        out = f(cloud, cloud)
        _ = float(jnp.sum(out[1]))
        times.append(time.perf_counter() - t)
    knn_ms = float(np.median(times)) * 1000

    print(
        json.dumps(
            {
                "metric": f"exact self-KNN k=32 @ {n_points} pts",
                "value": round(knn_ms, 1),
                "unit": "ms",
                "device": str(jax.devices()[0]),
            }
        )
    )

    # full RandLA-Net forward at n_points (the S3DIS-style large-scene
    # config): exact pallas KNN ("naive") and Morton-window approximate
    # ("approximate" — the reference's own regime choice at this scale,
    # model.py:160-184). The reference's torch path cannot run this at all
    # (its naive KNN OOMs past ~20k and FAISS is a per-layer CPU
    # round-trip).
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings

    for approach in ("approximate", "naive"):
        settings = RandLANetSettings(
            n_classes=2, n_features=0, knn=approach, n_points=n_points,
            n_neighbors=32, decimation=4,
        )
        model = Model(settings, seed=0)
        x = jnp.asarray(rng.randn(1, n_points, 3).astype(np.float32) * 0.2)
        perm = jnp.asarray(rng.permutation(n_points).astype(np.int32))
        try:
            fwd = jax.jit(
                lambda v, x, p: model._forward_jit(v, x, p)
            )
            out = fwd(model.variables, x, perm)
            _ = float(jnp.max(out))
            times = []
            for _i in range(3):
                t = time.perf_counter()
                out = fwd(model.variables, x + _i * 1e-12, perm)
                _ = float(jnp.max(out))
                times.append(time.perf_counter() - t)
            fwd_ms = float(np.median(times)) * 1000
            print(
                json.dumps(
                    {
                        "metric": (
                            f"RandLA-Net forward @ {n_points} pts"
                            f" (knn={approach})"
                        ),
                        "value": round(fwd_ms, 1),
                        "unit": "ms",
                    }
                )
            )
        except Exception as e:  # noqa: BLE001 — report OOM etc. and move on
            print(
                json.dumps(
                    {
                        "metric": f"forward @ {n_points} (knn={approach})",
                        "error": str(e)[:200],
                    }
                )
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576)
