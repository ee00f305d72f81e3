"""Mid-training checkpoint/resume.

The reference has NO mid-training persistence: best weights live in memory
(early_stopper.py:58) and only the final archive hits disk (SURVEY.md §5.4).
This module adds per-epoch checkpointing of the full training state
(variables + optimizer state + epoch + RNG cursor) as msgpack files, with
resume — crash recovery for long runs.

Layout: ``<dir>/ckpt_<epoch:05d>.msgpack`` (+ ``latest`` marker file).
"""

import json
from pathlib import Path
from typing import Dict, Optional

import jax
from flax import serialization as flax_serialization


def save_checkpoint(
    directory: Path, epoch: int, state: Dict, keep: int = 3
) -> Path:
    """Serialize a training-state pytree for ``epoch``; prunes old files."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"ckpt_{epoch:05d}.msgpack"
    path.write_bytes(flax_serialization.to_bytes(jax.device_get(state)))
    (directory / "latest").write_text(
        json.dumps({"epoch": epoch, "file": path.name})
    )
    checkpoints = sorted(directory.glob("ckpt_*.msgpack"))
    for old in checkpoints[:-keep]:
        old.unlink()
    return path


def latest_checkpoint(directory: Path) -> Optional[int]:
    """Epoch number of the newest checkpoint in ``directory`` (or None)."""
    directory = Path(directory)
    marker = directory / "latest"
    if not marker.exists():
        return None
    meta = json.loads(marker.read_text())
    if not (directory / meta["file"]).exists():
        return None
    return int(meta["epoch"])


def restore_checkpoint(directory: Path, epoch: Optional[int] = None) -> Dict:
    """Load the training-state pytree (raw msgpack dict)."""
    directory = Path(directory)
    if epoch is None:
        epoch = latest_checkpoint(directory)
        assert epoch is not None, f"no checkpoint found in {directory}"
    blob = (directory / f"ckpt_{epoch:05d}.msgpack").read_bytes()
    return flax_serialization.msgpack_restore(blob)
