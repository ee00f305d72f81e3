"""Early stopping with in-memory best-weights tracking.

Parity with the reference (``/root/reference/randlanet/utils/early_stopper.py``):
monitors a metric (``val_mIoU`` in the trainer, mode=max), snapshots the
weights on improvement (>= / <= comparison like the reference's
early_stopper.py:48-51 — ties count as improvement), stops after ``patience``
non-improving epochs. Here the snapshot is a host copy of the flax variables
pytree instead of a torch ``state_dict`` deepcopy.
"""

import logging
from typing import Dict, Optional

import jax
import numpy as np

logger = logging.getLogger("early stopper")


class EarlyStopper:
    def __init__(self, patience: int, metric: str, mode: str = "max"):
        """
        :param patience: Patience (in epochs) for early stopping.
        :param metric: Metric to monitor for early stopping.
        :param mode: Maximizing or minimizing the metric?
        """
        self._patience = patience
        self._metric = metric
        self._mode = mode
        assert self._mode in ("max", "min"), "mode should be max or min!"
        self.reset()

    def reset(self):
        self._count = 0
        self._best_variables: Optional[Dict] = None
        self._reference = -1.0 if self._mode == "max" else np.inf

    def check(self, metrics: Dict[str, float], variables: Dict) -> bool:
        """Check for improvement; snapshot weights on improvement; return
        whether to continue training (early_stopper.py:35-72)."""
        if self._metric not in metrics.keys():
            logger.warning(f"Metric {self._metric} not known!")
            return True
        if self._mode == "max":
            improvement = metrics[self._metric] >= self._reference
        else:
            improvement = metrics[self._metric] <= self._reference
        if improvement:
            self._count = 0
            self._reference = metrics[self._metric]
            self._best_variables = jax.device_get(variables)
        else:
            self._count += 1
            logger.info(
                f"No improvement in metric {self._metric} "
                f"({self._reference:.3f}) detected for "
                f"{self._count}/{self._patience} epochs."
            )
        continue_training: bool = self._count < self._patience
        if not continue_training:
            logger.info(
                f"Stopping training as no improvement in {self._metric} was "
                f"detected for {self._patience} consecutive test runs."
            )
        return continue_training

    @property
    def best_variables(self) -> Optional[Dict]:
        """The snapshotted best weights (or None if never improved)."""
        if self._best_variables is None:
            return None
        logger.info(
            f"Returning model with {self._metric}: {self._reference:.3f}"
        )
        return self._best_variables
