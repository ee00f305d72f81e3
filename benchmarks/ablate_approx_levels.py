"""Time the candidate KNN implementations at each in-model decimation
level size of the 64k `knn="approximate"` forward, to pick the per-level
routing (window vs approx_min_k vs exact pallas).

Background (VERDICT r2 weak #6 / next #8): the window search only engages
above _WINDOW_MIN_SUPPORT = 32768, so the 16k level rides the full
(M, N)-distance `approx_min_k` path — this script prices that choice
against the exact kernel and the window at every level.

Usage: python benchmarks/ablate_approx_levels.py [N] [reps]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn import knn_approximate, knn_window
    from recognizer3d_tpu.ops.knn_pallas import (
        knn_pallas_presorted,
        morton_order,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    k = 32
    rng = np.random.RandomState(0)

    def t(name, make_fn, *args, iters=10):
        dt = min(
            _device_time(make_fn, args, iters=iters) for _ in range(reps)
        )
        print(f"{name:46s} {dt * 1000:9.2f} ms")
        return dt

    for lvl in range(3):
        n = N // 4**lvl
        xyz = jnp.asarray(rng.randn(1, n, 3).astype(np.float32) * 0.2)
        order = morton_order(xyz)
        xs = jnp.take_along_axis(xyz, order[..., None], axis=1)

        def go_exact(c, x):
            idx, d2 = knn_pallas_presorted(x + c * 1e-12, x + c * 1e-12, k)
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        def go_approx(c, x):
            idx, d2 = knn_approximate(x + c * 1e-12, x + c * 1e-12, k)
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        def go_window(c, x):
            idx, d2 = knn_window(
                x + c * 1e-12, x + c * 1e-12, k, presorted=True
            )
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        t(f"exact pallas (presorted) @ {n}", go_exact, xs)
        if n * n * 4 <= 2 << 30:
            t(f"approx_min_k full-dist   @ {n}", go_approx, xs)
        t(f"morton window (presorted) @ {n}", go_window, xs)


if __name__ == "__main__":
    main()
