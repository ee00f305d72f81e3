"""Early stopping + in-memory best-weights snapshotting.

Behavior contract with the reference trainer (SURVEY.md §2.6, reference
early_stopper.py): watch one metric (the trainer passes ``val_mIoU``,
maximizing), snapshot the weights whenever the metric ties or beats the
best seen so far, and ask training to stop once ``patience`` consecutive
epochs go by without such an improvement. Unknown metric names never stop
training. The snapshot here is a ``jax.device_get`` host copy of the flax
variables pytree (the functional analogue of a ``state_dict`` deepcopy).
"""

import logging
import operator
from typing import Dict, Optional

import jax

log = logging.getLogger("early stopper")


class EarlyStopper:
    """Stateful stop-or-continue decision, one ``check()`` per epoch."""

    def __init__(self, patience: int, metric: str, mode: str = "max"):
        """
        :param patience: epochs without improvement before stopping.
        :param metric: key into the epoch metrics dict to watch.
        :param mode: "max" (higher is better) or "min".
        """
        if mode not in ("max", "min"):
            raise AssertionError("mode should be max or min!")
        # ties count as improvement, so >= / <= (keeps the LAST of equally
        # good epochs, matching the reference's comparison direction)
        self._better = operator.ge if mode == "max" else operator.le
        self._patience = patience
        self._metric = metric
        self._best: Optional[float] = None
        self._best_variables: Optional[Dict] = None
        self._stale_epochs = 0

    def check(self, metrics: Dict[str, float], variables: Dict) -> bool:
        """Record one epoch's metrics; return True to keep training."""
        value = metrics.get(self._metric)
        if value is None:
            log.warning(f"Metric {self._metric} not known!")
            return True
        if self._best is None or self._better(value, self._best):
            self._best = value
            self._best_variables = jax.device_get(variables)
            self._stale_epochs = 0
            return True
        self._stale_epochs += 1
        log.info(
            f"{self._metric} has not improved on {self._best:.3f} for "
            f"{self._stale_epochs} of {self._patience} allowed epochs."
        )
        if self._stale_epochs < self._patience:
            return True
        log.info(
            f"Early stop: {self._metric} stalled for "
            f"{self._patience} consecutive evaluations."
        )
        return False

    @property
    def best_variables(self) -> Optional[Dict]:
        """Host copy of the weights from the best epoch (None if no epoch
        ever reported the watched metric)."""
        if self._best_variables is not None:
            log.info(
                f"Returning model with {self._metric}: {self._best:.3f}"
            )
        return self._best_variables
