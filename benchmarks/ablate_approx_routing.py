"""Price the two routing changes for the `knn="approximate"` forward:

1. level-1 self-KNN (16k², k=32): approx_min_k full-dist vs Morton window
   — includes the window's RECALL at 16k support (synthetic + the
   reference's real L515 captures), since the threshold change is only
   safe if recall holds at the smaller support;
2. decoder 1-NN (support 16k, query 64k): approx_min_k full-dist vs the
   EXACT presorted streaming-argmin kernel (argmin_pallas_presorted) —
   "approximate" semantics permit an exact answer, so if the exact kernel
   is no slower the routing change is free accuracy.

Usage: python benchmarks/ablate_approx_routing.py  (TPU)
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from benchmarks._timing import device_time as _device_time

MOCK = Path("/root/reference/data/mock")


def _recall(approx_idx, exact_idx):
    hits = 0
    a = np.asarray(approx_idx)
    e = np.asarray(exact_idx)
    for m in range(a.shape[1]):
        hits += len(set(a[0, m]) & set(e[0, m]))
    return hits / e[0].size


def main():
    import jax.numpy as jnp

    from recognizer3d_tpu.ops.knn import knn_approximate, knn_window
    from recognizer3d_tpu.ops.knn_pallas import (
        argmin_pallas_presorted,
        knn_pallas_presorted,
        morton_order,
    )

    k = 32
    rng = np.random.RandomState(0)

    def sort(xyz):
        order = morton_order(xyz)
        return jnp.take_along_axis(xyz, order[..., None], axis=1)

    def t(name, fn, *args, iters=10, reps=2):
        dt = min(_device_time(fn, args, iters=iters) for _ in range(reps))
        print(f"{name:52s} {dt * 1000:9.2f} ms")
        return dt

    # ------------------------------------------------------------------
    # 1. level-1 self-KNN: recall of the window at 16k support
    # ------------------------------------------------------------------
    print("== level-1 self-KNN (16384 pts, k=32): window recall ==")
    clouds = [np.load(f) for f in sorted(MOCK.glob("*_data.npy"))[:5]]
    for label, subs in [
        (
            "synthetic gaussian",
            [rng.randn(16384, 3).astype(np.float32) * 0.2 for _ in range(3)],
        ),
        (
            "real L515 capture",
            [
                c[np.random.RandomState(0).choice(len(c), 16384, False)]
                for c in clouds
            ],
        ),
    ]:
        recalls = []
        for s in subs:
            xs = sort(jnp.asarray(s[None]))
            wi, _ = knn_window(xs, xs, k, presorted=True)
            ei, _ = knn_pallas_presorted(xs, xs, k)
            recalls.append(_recall(wi, ei))
        print(
            f"  {label}: mean {np.mean(recalls):.4f} "
            f"({min(recalls):.4f}-{max(recalls):.4f})"
        )

    # ------------------------------------------------------------------
    # 2. decoder 1-NN: support 16384, query 65536
    # ------------------------------------------------------------------
    print("== decoder 1-NN (support 16384 -> query 65536) ==")
    xyz = sort(jnp.asarray(rng.randn(1, 65536, 3).astype(np.float32) * 0.2))
    sup = xyz[:, :16384]  # prefix decimation in sorted order

    def go_approx(c, s, q):
        idx, d2 = knn_approximate(s + c * 1e-12, q, 1)
        return jnp.float32(jnp.sum(d2[:, :8, :1]))

    def go_exact_argmin(c, s, q):
        idx, d2 = argmin_pallas_presorted(s + c * 1e-12, q)
        return jnp.float32(jnp.sum(d2[:, :8, :1]))

    def go_window(c, s, q):
        idx, d2 = knn_window(s + c * 1e-12, q, 1, presorted=True)
        return jnp.float32(jnp.sum(d2[:, :8, :1]))

    t("approx_min_k full-dist (current routing)", go_approx, sup, xyz)
    t("exact argmin_pallas_presorted", go_exact_argmin, sup, xyz)
    t("morton window k=1", go_window, sup, xyz)

    # the second-largest decoder call: support 4096 -> query 16384
    sup2 = xyz[:, :4096]
    q2 = xyz[:, :16384]
    t("approx_min_k 4096->16384 (current)", go_approx, sup2, q2)
    t("exact argmin 4096->16384", go_exact_argmin, sup2, q2)


if __name__ == "__main__":
    main()
