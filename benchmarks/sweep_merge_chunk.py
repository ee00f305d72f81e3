"""Sweep the exact-KNN kernel's (query_block, support_tile, merge_chunk)
space at several self-KNN sizes (TPU). If a sub-chunked merge config beats
the current defaults, update ``_MERGE_CHUNK`` / ``_presorted_blocks`` in
recognizer3d_tpu/ops/knn_pallas.py.

Usage: python benchmarks/sweep_merge_chunk.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax.numpy as jnp

from _timing import device_time
from recognizer3d_tpu.ops.knn_pallas import knn_pallas

COMBOS = [
    (128, 1024, 1024), (128, 1024, 512), (128, 1024, 256), (128, 1024, 128),
    (256, 1024, 256), (256, 1024, 128),
    (512, 1024, 128),
    (128, 2048, 256), (128, 2048, 128), (256, 2048, 256),
]


def main():
    rng = np.random.RandomState(0)
    for n in (65536, 16384, 4096):
        x = jnp.asarray(rng.randn(1, n, 3).astype(np.float32) * 0.2)
        for qb, ts, mc in COMBOS:
            def go(c, x, qb=qb, ts=ts, mc=mc):
                _idx, d2 = knn_pallas(
                    x + c * 1e-12, x + c * 1e-12, 32,
                    query_block=qb, support_tile=ts, merge_chunk=mc,
                )
                return jnp.float32(jnp.sum(d2[:, :8, :1]))

            dt = device_time(go, (x,), iters=5)
            print(
                f"N={n:6d} qb={qb:4d} ts={ts:5d} mc={mc:5d}  "
                f"{dt * 1000:8.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
