"""Sweep pallas-KNN block sizes under the current merge design.

Usage: python benchmarks/sweep_blocks.py [N]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn_pallas import knn_pallas

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.2)

    for qb in (64, 128, 192, 256):
        for ts in (512, 1024):

            def go(c, x, qb=qb, ts=ts):
                idx, d2 = knn_pallas(
                    x + c * 1e-12, x + c * 1e-12, 32,
                    query_block=qb, support_tile=ts,
                )
                return jnp.float32(jnp.sum(d2[:, :8, :1]))

            dt = device_time(go, (x,), iters=5)
            print(f"qb={qb:4d} ts={ts:5d}  {dt * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
