"""Early stopping + in-memory best-weights snapshotting.

Behavior contract with the reference trainer (SURVEY.md §2.6, reference
early_stopper.py): watch one metric (the trainer passes ``val_mIoU``,
maximizing), snapshot the weights whenever the metric ties or beats the
best seen so far, and ask training to stop once ``patience`` consecutive
epochs go by without such an improvement. Unknown metric names never stop
training. The snapshot is the functional analogue of a ``state_dict``
deepcopy — an ON-DEVICE clone (one jitted copy program) rather than a host
download: the trainer donates the live buffers into the next epoch's step,
so a copy is required, but pulling the whole weight pytree to the host every
improving epoch costs a relay round-trip per leaf on remote-TPU setups.
The trade-off: the snapshot occupies HBM for the whole run (one extra full
copy of params+batch_stats — negligible for this model family at <10 MB,
but an unstated overhead if reused for much larger models) and is lost if
the device wedges mid-run; ``device_get`` the snapshot lazily instead when
either matters.
"""

import logging
import operator
from typing import Dict, Optional

import jax
import jax.numpy as jnp

log = logging.getLogger("early stopper")

_clone = jax.jit(lambda tree: jax.tree.map(jnp.copy, tree))


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
            self._best_variables = _clone(variables)
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
        """Clone of the weights from the best epoch (None if no epoch ever
        reported the watched metric)."""
        if self._best_variables is not None:
            log.info(
                f"Returning model with {self._metric}: {self._best:.3f}"
            )
        return self._best_variables
