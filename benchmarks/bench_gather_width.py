"""Measure gather_neighbors cost vs table channel count (row alignment).

Usage: python benchmarks/bench_gather_width.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from benchmarks._timing import device_time as _device_time


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn import gather_neighbors

    N, K = 65536, 32
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, (1, N, K)).astype(np.int32))

    for C in [3, 8, 16, 19, 24, 32, 35, 48, 64]:
        f = jnp.asarray(rng.randn(1, N, C).astype(np.float32))

        def go(c, f, idx):
            out = gather_neighbors(f + c * 1e-12, idx)
            return jnp.float32(jnp.max(out))

        dt = _device_time(go, (f, idx), iters=10)
        print(f"C={C:3d}  {dt * 1000:7.2f} ms")

    # gather feeding an elementwise consumer (forces the consumer-layout
    # relayout if any)
    C = 19
    f = jnp.asarray(rng.randn(1, N, C).astype(np.float32))

    def go2(c, f, idx):
        out = gather_neighbors(f + c * 1e-12, idx)
        out = out * 2.0 + 1.0
        s = jnp.sum(out, axis=2)  # reduce over K like the pooling
        return jnp.float32(jnp.max(s))

    dt = _device_time(go2, (f, idx), iters=10)
    print(f"C=19 + elementwise + K-reduce consumer: {dt * 1000:7.2f} ms")


if __name__ == "__main__":
    main()
