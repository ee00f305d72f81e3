"""TensorBoard scalar logging with a dependency-free fallback.

The reference logs per-epoch scalars through torch's SummaryWriter
(``/root/reference/randlanet/utils/trainer.py:100-102, 227-242``). We use the
real SummaryWriter when the tensorboard package is importable and otherwise
fall back to a JSONL scalar log (``scalars.jsonl`` in the log dir) with the
same ``add_scalar`` surface, so training never gains a hard dependency.
"""

import json
import time
from pathlib import Path


class JsonlSummaryWriter:
    """Minimal SummaryWriter stand-in: one JSON line per scalar."""

    def __init__(self, log_dir: str):
        self._dir = Path(log_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._f = (self._dir / "scalars.jsonl").open("a")

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._f.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "wall_time": time.time()}
            )
            + "\n"
        )
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def make_summary_writer(log_dir):
    """Return a torch SummaryWriter when available, else the JSONL fallback."""
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: WPS433

        return SummaryWriter(str(log_dir))
    except Exception:
        return JsonlSummaryWriter(str(log_dir))
