"""Measure the CPU PyTorch reference's TRAINING time on ~100 labelled
clouds (the BASELINE.md "train on ~100 labelled clouds" benchmark config).

Runs the reference's own app recipe (reference train.py:44-102: Dataset
with broadened annotations, seed-3 80/20 split, n_points=2500 / K=32 /
decimation=4, 50 epochs, batch 4, lr 1e-2, dice) on ``data/mock100``
(bin/make_mock_data 100 60000 data/mock100 --annotate — the same clouds
the TPU framework trains on, interchangeable on-disk format), imported
from /root/reference with the exact-numpy faiss stand-in.

Because the full 50 epochs can take hours on one CPU core, ``--epochs N``
(default 3) measures N epochs and extrapolates the 50-epoch total from
the per-epoch median; the JSON records both the measured and extrapolated
figures. Results merge into ``benchmarks/baseline_cpu.json``.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
OUT = REPO / "benchmarks" / "baseline_cpu.json"
APP_EPOCHS = 50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--dataset", type=Path, default=REPO / "data/mock100")
    args = ap.parse_args()

    assert REFERENCE.exists(), "reference checkout not available"
    sys.path.insert(0, str(REPO))
    from tests._faiss_stub import install

    install()
    sys.path.insert(0, str(REFERENCE))
    import torch

    torch.manual_seed(0)
    from dataset import Dataset, DatasetMerged
    from randlanet import (
        AugmentationSettings,
        Model,
        RandLANetSettings,
        TrainingSettings,
    )

    dataset = DatasetMerged(
        [Dataset(args.dataset, broaden_annotations=True)]
    )
    train_ds, val_ds = dataset.split()
    print(f"train {len(train_ds)} clouds / val {len(val_ds)}", flush=True)

    settings = RandLANetSettings(
        n_classes=2, n_features=0, knn="naive", n_points=2500,
        n_neighbors=32, decimation=4,
    )
    model = Model(settings, use_gpu=False)
    training_settings = TrainingSettings(
        epochs=args.epochs, batch_size=4, learning_rate=1e-2,
        early_stopping=False,
    )
    augmentation_settings = AugmentationSettings(
        jitter_variance=0.01, jitter_limit=0.05, scale_limit=0.2,
        shift_limit=0.1, rotation_angle_variances=(0.06, 0.06, 0.06),
        rotation_angle_limits=(0.18, 0.18, 0.18),
    )

    epoch_times = []
    last = [time.perf_counter()]

    def epoch_callback(epoch, metrics):
        now = time.perf_counter()
        epoch_times.append(now - last[0])
        last[0] = now
        print(f"epoch {epoch}: {epoch_times[-1]:.1f} s", flush=True)

    t0 = time.perf_counter()
    model.train(
        train_ds,
        val_ds,
        training_settings,
        augmentation_settings,
        None,
        ["background", "fingerpoint"],
        callbacks=[epoch_callback],
    )
    total = time.perf_counter() - t0

    epoch_times_sorted = sorted(epoch_times)
    per_epoch = epoch_times_sorted[len(epoch_times_sorted) // 2]
    results = {
        "train100_epochs_measured": args.epochs,
        "train100_measured_sec": total,
        "train100_per_epoch_sec": per_epoch,
        "train100_extrapolated_50epoch_min": per_epoch * APP_EPOCHS / 60.0,
    }
    print(json.dumps(results, indent=2))
    merged = json.loads(OUT.read_text()) if OUT.exists() else {}
    merged.update(results)
    OUT.write_text(json.dumps(merged, indent=2) + "\n")
    print(f"merged into {OUT}")


if __name__ == "__main__":
    main()
