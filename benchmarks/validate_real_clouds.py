"""Validate the approximate-KNN path on the reference's REAL captures.

The 15 clouds in /root/reference/data/mock/*.npy are genuine L515
captures (~140k points) — exactly the live-frame distribution. This
script measures, on that data rather than synthetic gaussians:

1. Morton-window KNN recall vs the exact kernel (k=32, self-KNN at the
   64k forward regime where ``knn="approximate"`` routes to the window);
2. the end-to-end effect of that recall on MODEL OUTPUT: per-point
   prediction masks of the SAME pretrained weights run at a 64k config
   with knn="naive" (exact) vs knn="approximate", scored as IoU between
   the two predictions (exact output = reference truth);
3. the full predict path (consistent subsample -> forward -> 1-NN
   upsample -> threshold) on every real cloud — the live loop's exact
   computation — with per-cloud wall times.

Run: python benchmarks/validate_real_clouds.py   (TPU, ~10 min compile)
Writes benchmarks/real_cloud_validation.json.
"""

import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
MOCK = Path("/root/reference/data/mock")


def _recall(window_idx, exact_idx):
    hits = 0
    w = np.asarray(window_idx)
    e = np.asarray(exact_idx)
    for m in range(w.shape[1]):
        hits += len(set(w[0, m]) & set(e[0, m]))
    return hits / e[0].size


def main():
    import sys

    sys.path.insert(0, str(REPO))
    import jax.numpy as jnp

    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.ops.knn import knn_window
    from recognizer3d_tpu.ops.knn_pallas import knn_pallas

    clouds = [np.load(f) for f in sorted(MOCK.glob("*_data.npy"))]
    assert clouds, "reference mock captures not found"
    report = {"n_clouds": len(clouds)}

    # 1. window-KNN recall on real geometry (64k subsets, k=32)
    n = 65536
    recalls = []
    for cloud in clouds[:5]:
        sub = jnp.asarray(
            cloud[np.random.RandomState(0).choice(len(cloud), n, False)][None]
        )
        wi, _ = knn_window(sub, sub, 32)
        ei, _ = knn_pallas(sub, sub, 32)
        recalls.append(_recall(wi, ei))
    report["window_recall_64k_real"] = {
        "per_cloud": [round(r, 4) for r in recalls],
        "mean": round(float(np.mean(recalls)), 4),
    }

    # 2. prediction IoU: exact vs approximate KNN at the 64k config,
    #    same pretrained weights
    model_path = REPO / "pretrained" / "mock_fingertip"
    m_exact = Model.load(model_path, n_points=n, knn="naive")
    m_appr = Model.load(model_path, n_points=n, knn="approximate")
    ious, pos_frac = [], []
    for cloud in clouds[:5]:
        sub = cloud[np.random.RandomState(0).choice(len(cloud), n, False)]
        pred_e = m_exact.predict(sub, prepostprocess=False).argmax(0)
        pred_a = m_appr.predict(sub, prepostprocess=False).argmax(0)
        inter = np.sum((pred_e == 1) & (pred_a == 1))
        union = np.sum((pred_e == 1) | (pred_a == 1))
        ious.append(float(inter / union) if union else 1.0)
        pos_frac.append(float(np.mean(pred_e)))
    report["approx_vs_exact_prediction"] = {
        "foreground_iou_per_cloud": [round(v, 4) for v in ious],
        "foreground_iou_mean": round(float(np.mean(ious)), 4),
        "exact_foreground_fraction": [round(v, 4) for v in pos_frac],
        "note": "IoU of the approximate-KNN model's foreground mask vs "
        "the exact-KNN model's (same pretrained weights, same input)",
    }

    # 3. full predict path on every real cloud (the live-loop computation)
    app_model = Model.load(model_path)
    times, positives = [], []
    for cloud in clouds:
        t0 = time.perf_counter()
        mask = app_model.predict_mask(cloud.astype(np.float32), 0.5)
        times.append(time.perf_counter() - t0)
        positives.append(int(mask.sum()))
    times = times[1:]  # first call compiles per-bucket programs
    report["live_predict_real_clouds"] = {
        "wall_p50_ms": round(float(np.median(times)) * 1e3, 1),
        "wall_max_ms": round(float(np.max(times)) * 1e3, 1),
        "positives_per_cloud": positives,
        "cloud_sizes": [int(c.shape[0]) for c in clouds],
    }

    print(json.dumps(report, indent=2))
    (REPO / "benchmarks" / "real_cloud_validation.json").write_text(
        json.dumps(report, indent=2)
    )


if __name__ == "__main__":
    main()
