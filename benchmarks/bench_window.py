"""Compare exact pallas KNN vs Morton-window approximate KNN at large N,
and measure window recall on a realistic (mock-camera) cloud.

Usage: python benchmarks/bench_window.py [N ...]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn import knn_window
    from recognizer3d_tpu.ops.knn_pallas import knn_pallas

    sizes = [int(a) for a in sys.argv[1:]] or [65536, 262144, 1048576]
    rng = np.random.RandomState(0)
    for n in sizes:
        x = jnp.asarray(rng.randn(1, n, 3).astype(np.float32) * 0.2)

        def go_exact(c, x):
            idx, d2 = knn_pallas(x + c * 1e-12, x + c * 1e-12, 32)
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        def go_window(c, x):
            idx, d2 = knn_window(x + c * 1e-12, x + c * 1e-12, 32)
            return jnp.float32(jnp.sum(d2[:, :8, :1]))

        te = _device_time(go_exact, (x,), iters=3)
        tw = _device_time(go_window, (x,), iters=3)
        print(
            f"N={n:8d}  exact {te * 1000:9.1f} ms   window {tw * 1000:8.1f} ms"
            f"   speedup {te / tw:5.1f}x"
        )

        # recall of window vs exact on the smallest size (cheap host check)
        if n == sizes[0]:
            ie, _ = knn_pallas(x, x, 32)
            iw, _ = knn_window(x, x, 32)
            ie_n = np.asarray(ie[0])
            iw_n = np.asarray(iw[0])
            hits = sum(
                len(set(ie_n[i]) & set(iw_n[i]))
                for i in range(0, n, max(1, n // 2000))
            )
            total = 32 * len(range(0, n, max(1, n // 2000)))
            print(f"            window recall vs exact @ {n}: {hits / total:.4f}")


if __name__ == "__main__":
    main()
