"""bfloat16 accuracy gate (VERDICT r3 #5): price the f32→bf16 activation
swap in MODEL OUTPUT, replicating the exact-vs-approx methodology of
validate_real_clouds.py:

1. prediction IoU on the reference's 15 REAL L515 captures: the SAME
   pretrained weights run at the 64k knn="approximate" config with
   compute_dtype float32 vs bfloat16, scored as foreground-mask IoU
   (f32 output = truth). The accepted envelope is the approx-vs-exact
   path's 0.982 mean IoU (benchmarks/real_cloud_validation.json).
2. 10-seed eval mIoU ± σ on mock100 (bin/make_mock_data 100 60000
   data/mock100 --annotate, seed-3 val split) under both dtypes.

Run: python benchmarks/validate_bf16.py   (TPU; compiles ~5 min)
Writes benchmarks/bf16_validation.json.
"""

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
MOCK = Path("/root/reference/data/mock")
MOCK100 = REPO / "data" / "mock100"


def main():
    sys.path.insert(0, str(REPO))
    from recognizer3d_tpu.data.dataset import Dataset
    from recognizer3d_tpu.models.facade import Model

    report = {}
    model_path = REPO / "pretrained" / "mock_fingertip"

    # 1. f32-vs-bf16 prediction IoU on the real captures (64k approx config)
    clouds = [np.load(f) for f in sorted(MOCK.glob("*_data.npy"))]
    n = 65536
    clouds = [c for c in clouds if len(c) >= n]  # one capture is 41k < 64k
    assert clouds, f"no reference captures with >= {n} points found"
    m32 = Model.load(model_path, n_points=n, knn="approximate")
    mbf = Model.load(
        model_path, n_points=n, knn="approximate", compute_dtype="bfloat16"
    )
    ious, pos_frac = [], []
    for cloud in clouds:
        sub = cloud[np.random.RandomState(0).choice(len(cloud), n, False)]
        pred_32 = m32.predict(sub, prepostprocess=False).argmax(0)
        pred_bf = mbf.predict(sub, prepostprocess=False).argmax(0)
        inter = np.sum((pred_32 == 1) & (pred_bf == 1))
        union = np.sum((pred_32 == 1) | (pred_bf == 1))
        ious.append(float(inter / union) if union else 1.0)
        pos_frac.append(float(np.mean(pred_32)))
    report["bf16_vs_f32_prediction"] = {
        "foreground_iou_per_cloud": [round(v, 4) for v in ious],
        "foreground_iou_mean": round(float(np.mean(ious)), 4),
        "foreground_iou_min": round(float(np.min(ious)), 4),
        "f32_foreground_fraction": [round(v, 4) for v in pos_frac],
        "note": "IoU of the bfloat16 model's foreground mask vs the "
        "float32 model's (same pretrained weights, same 64k input, "
        "knn=approximate both)",
    }
    print(json.dumps(report, indent=2), flush=True)

    # 2. 10-seed eval mIoU on mock100 under both dtypes (app config)
    assert MOCK100.exists(), (
        "generate first: bin/make_mock_data 100 60000 data/mock100 --annotate"
    )
    ds = Dataset(MOCK100, broaden_annotations=True)
    _, val = ds.split()
    names = ["background", "fingerpoint"]
    evals = {}
    for dtype in ("float32", "bfloat16"):
        m = Model.load(model_path, compute_dtype=dtype)
        metrics = m.evaluate(val, names, batch_size=16, include_stdev=True)
        evals[dtype] = {
            k: [round(float(x), 5) for x in v]
            if isinstance(v, tuple)
            else round(float(v), 5)
            for k, v in metrics.items()
        }
        print(dtype, evals[dtype]["mIoU"], flush=True)
    report["mock100_eval_10seed"] = evals
    report["mock100_mIoU_delta"] = round(
        evals["float32"]["mIoU"][0] - evals["bfloat16"]["mIoU"][0], 5
    )

    print(json.dumps(report["mock100_eval_10seed"], indent=2))
    (REPO / "benchmarks" / "bf16_validation.json").write_text(
        json.dumps(report, indent=2) + "\n"
    )
    print("wrote benchmarks/bf16_validation.json")


if __name__ == "__main__":
    main()
