"""Training-OUTCOME parity: torch reference trainer vs the TPU trainer.

Forward logits are already bit-matched (tests/test_torch_parity.py), but
that only proves the *function*; this proves the *training dynamics* — the
optimizer / LR schedule / BN-state / loss pipeline — by running BOTH
trainers to completion on the identical reduced-but-honest recipe and
comparing final val mIoU ± σ (10-seed protocol) and loss trajectories.

Shared recipe (the reference app's, /root/reference/train.py:50-68, with
cloud count and epochs reduced so the 1-core torch run finishes in <1 h):
  - dataset: data/parity30 (bin/make_mock_data 30 20000 data/parity30
    --annotate), broaden_annotations=True, seed-3 80/20 split -> 24/6
  - RandLANetSettings(n_classes=2, n_features=0, knn="naive",
    n_points=2500, n_neighbors=32, decimation=4)
  - 20 epochs, batch 4, lr 1e-2, StepLR(10, 0.9), dice, early stopping
    OFF, app augmentation settings
  - per-epoch val: the trainer's own 10-seed evaluate
    (/root/reference/randlanet/utils/trainer.py:135-140)
  - final: Model.evaluate(val, batch_size=4, include_stdev=True)

Usage:
  python benchmarks/compare_training_parity.py reference   # torch, ~30-45 min 1-core
  python benchmarks/compare_training_parity.py tpu         # ours (TPU or CPU)
  python benchmarks/compare_training_parity.py report      # compare the JSONs

Each run writes benchmarks/training_parity_<side>.json with the per-epoch
metric trajectory and the final 10-seed eval; `report` prints the RESULTS.md
table and the overlap check.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
DATASET = REPO / "data" / "parity30"
CLASS_NAMES = ["background", "fingerpoint"]
EPOCHS = 20
BATCH = 4
LR = 1e-2

MODEL_KW = dict(
    n_classes=2, n_features=0, knn="naive",
    n_points=2500, n_neighbors=32, decimation=4,
)
AUG_KW = dict(
    jitter_variance=0.01, jitter_limit=0.05, scale_limit=0.2,
    shift_limit=0.1, rotation_angle_variances=(0.06, 0.06, 0.06),
    rotation_angle_limits=(0.18, 0.18, 0.18),
)


def _flatten(metrics):
    """Callback metrics -> flat {str: float} (tuples -> mean)."""
    out = {}
    for k, v in metrics.items():
        if isinstance(v, tuple):
            v = v[0]
        try:
            out[k] = float(v)
        except (TypeError, ValueError):
            pass
    return out


def _out(side: str) -> Path:
    return REPO / "benchmarks" / f"training_parity_{side}.json"


def _write(side, epochs_log, final_eval, wall_sec, extra=None):
    rec = {
        "side": side,
        "recipe": {
            "dataset": str(DATASET.relative_to(REPO)),
            "epochs": EPOCHS, "batch_size": BATCH, "learning_rate": LR,
            "loss": "dice", "early_stopping": False, **MODEL_KW,
        },
        "wall_sec": wall_sec,
        "epochs": epochs_log,
        "final_eval": final_eval,
    }
    if extra:
        rec.update(extra)
    _out(side).write_text(json.dumps(rec, indent=2) + "\n")
    print(f"wrote {_out(side)}")


def run_reference():
    sys.path.insert(0, str(REPO))
    from tests._faiss_stub import install

    install()
    sys.path.insert(0, str(REFERENCE))
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    np.random.seed(0)
    from dataset import Dataset, DatasetMerged
    from randlanet import (
        AugmentationSettings,
        Model,
        RandLANetSettings,
        TrainingSettings,
    )

    ds = DatasetMerged([Dataset(DATASET, broaden_annotations=True)])
    train_ds, val_ds = ds.split()
    print(f"train {len(train_ds)} / val {len(val_ds)}", flush=True)

    model = Model(RandLANetSettings(**MODEL_KW), use_gpu=False)
    tset = TrainingSettings(
        epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
        early_stopping=False,
    )
    aug = AugmentationSettings(**AUG_KW)

    epochs_log = []
    last = [time.perf_counter()]

    def cb(epoch, metrics):
        now = time.perf_counter()
        rec = _flatten(metrics)
        rec["epoch"] = epoch
        rec["epoch_sec"] = now - last[0]
        last[0] = now
        epochs_log.append(rec)
        print(
            f"epoch {epoch}: loss {rec.get('loss', float('nan')):.4f} "
            f"val_mIoU {rec.get('val_mIoU', float('nan')):.4f} "
            f"({rec['epoch_sec']:.1f}s)",
            flush=True,
        )

    t0 = time.perf_counter()
    model.train(train_ds, val_ds, tset, aug, None, CLASS_NAMES, callbacks=[cb])
    wall = time.perf_counter() - t0
    final = model.evaluate(
        val_ds, CLASS_NAMES, batch_size=BATCH, include_stdev=True
    )
    final = {k: list(v) if isinstance(v, tuple) else v for k, v in final.items()}
    print("final:", json.dumps(final, indent=2), flush=True)
    _write("reference", epochs_log, final, wall,
           {"torch_threads": 1})


def run_tpu(device_pipeline: bool):
    sys.path.insert(0, str(REPO))
    import jax

    np.random.seed(0)
    from recognizer3d_tpu.data.augmentation import AugmentationSettings
    from recognizer3d_tpu.data.dataset import Dataset, DatasetMerged
    from recognizer3d_tpu.models.facade import Model
    from recognizer3d_tpu.models.settings import RandLANetSettings
    from recognizer3d_tpu.training.settings import TrainingSettings

    ds = DatasetMerged([Dataset(DATASET, broaden_annotations=True)])
    train_ds, val_ds = ds.split()
    print(
        f"train {len(train_ds)} / val {len(val_ds)} "
        f"on {jax.default_backend()}",
        flush=True,
    )

    model = Model(RandLANetSettings(**MODEL_KW))
    tset = TrainingSettings(
        epochs=EPOCHS, batch_size=BATCH, learning_rate=LR,
        early_stopping=False, device_pipeline=device_pipeline,
    )
    aug = AugmentationSettings(**AUG_KW)

    epochs_log = []
    last = [time.perf_counter()]

    def cb(epoch, metrics):
        now = time.perf_counter()
        rec = _flatten(metrics)
        rec["epoch"] = epoch
        rec["epoch_sec"] = now - last[0]
        last[0] = now
        epochs_log.append(rec)
        print(
            f"epoch {epoch}: loss {rec.get('loss', float('nan')):.4f} "
            f"val_mIoU {rec.get('val_mIoU', float('nan')):.4f} "
            f"({rec['epoch_sec']:.1f}s)",
            flush=True,
        )

    t0 = time.perf_counter()
    model.train(train_ds, val_ds, tset, aug, None, CLASS_NAMES, callbacks=[cb])
    wall = time.perf_counter() - t0
    final = model.evaluate(
        val_ds, CLASS_NAMES, batch_size=BATCH, include_stdev=True
    )
    final = {k: list(v) if isinstance(v, tuple) else v for k, v in final.items()}
    print("final:", json.dumps(final, indent=2), flush=True)
    _write("tpu", epochs_log, final, wall,
           {"backend": jax.default_backend(),
            "device_pipeline": device_pipeline})


def report():
    sides = {}
    for side in ("reference", "tpu"):
        p = _out(side)
        if not p.exists():
            print(f"missing {p} — run `{sys.argv[0]} {side}` first")
            return 1
        sides[side] = json.loads(p.read_text())

    print("\n## Trainer parity (shared recipe, data/parity30, 20 epochs)\n")
    print("| side | final val mIoU ± σ | final val loss ± σ | "
          "fingerpoint IoU ± σ | wall |")
    print("|---|---|---|---|---|")
    finals = {}
    for side, rec in sides.items():
        f = rec["final_eval"]

        def ms(key):
            v = f.get(key)
            if isinstance(v, list):
                return v[0], v[1]
            return float(v), 0.0

        miou = ms("mIoU")
        loss = ms("loss")
        fp = ms("fingerpoint IoU") if "fingerpoint IoU" in f else (
            float("nan"), float("nan"))
        finals[side] = miou
        print(
            f"| {side} | {miou[0]:.4f} ± {miou[1]:.4f} "
            f"| {loss[0]:.4f} ± {loss[1]:.4f} "
            f"| {fp[0]:.4f} ± {fp[1]:.4f} "
            f"| {rec['wall_sec']:.0f} s |"
        )

    (m_ref, s_ref), (m_tpu, s_tpu) = finals["reference"], finals["tpu"]
    gap = abs(m_ref - m_tpu)
    overlap = gap <= (s_ref + s_tpu)
    print(f"\nmIoU gap {gap:.4f} vs σ_ref+σ_tpu {s_ref + s_tpu:.4f} -> "
          f"{'OVERLAP: parity holds' if overlap else 'NO overlap'}")

    print("\nloss trajectory (train loss / val_mIoU per epoch):")
    print("| epoch | ref loss | tpu loss | ref val_mIoU | tpu val_mIoU |")
    print("|---|---|---|---|---|")
    ref_e = {e["epoch"]: e for e in sides["reference"]["epochs"]}
    tpu_e = {e["epoch"]: e for e in sides["tpu"]["epochs"]}
    for ep in sorted(set(ref_e) | set(tpu_e)):
        r, t = ref_e.get(ep, {}), tpu_e.get(ep, {})
        print(
            f"| {ep} | {r.get('loss', float('nan')):.4f} "
            f"| {t.get('loss', float('nan')):.4f} "
            f"| {r.get('val_mIoU', float('nan')):.4f} "
            f"| {t.get('val_mIoU', float('nan')):.4f} |"
        )
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("side", choices=["reference", "tpu", "report"])
    ap.add_argument(
        "--host-loader", action="store_true",
        help="tpu side: use the host data loader instead of device_pipeline",
    )
    args = ap.parse_args()
    if args.side == "reference":
        run_reference()
    elif args.side == "tpu":
        run_tpu(device_pipeline=not args.host_loader)
    else:
        sys.exit(report())


if __name__ == "__main__":
    main()
