"""Large-scene stretch benchmark (BASELINE.json config 5): 1M-point
S3DIS-style clouds through the tiled/HBM Pallas KNN and the decimation
hierarchy. Standalone (not part of bench.py's driver line — the compile
alone takes minutes).

Usage: python benchmarks/bench_large.py [n_points]
"""

import json
import sys
import time

import numpy as np


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


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576)
