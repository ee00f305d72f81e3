"""Segmentation metrics.

Semantics match the reference (``/root/reference/randlanet/utils/metrics.py``):

- predictions = argmax over the class dim (axis -2, so batch-dim agnostic);
- per-class accuracy: when a class has no labels, the accuracy is 1.0 iff no
  point was (in)correctly matched to it — exactly the reference's
  ``(per_class_accuracy == 0)`` fallback (metrics.py:27-28);
- per-class IoU: union == 0 → 1.0 (metrics.py:53-54);
- mIoU = nanmean of per-class IoUs.

The core computations (:func:`accuracy_array`, :func:`iou_array`) are pure
jnp so they run inside jitted train/eval steps and return device arrays; the
:func:`accuracy` / :func:`iou` wrappers return host floats/lists with the
reference's exact signatures. ``MetricCollector`` / ``MetricCollectorBag``
reproduce the collection/averaging layer (metrics.py:62-256).
"""

from collections import OrderedDict
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def accuracy_array(
    logits: jax.Array, labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Overall + per-class accuracy as device arrays.

    :param logits: (..., C, N) network output before softmax.
    :param labels: (..., N) integer class labels.
    :return: (scalar overall accuracy, (C,) per-class accuracies)
    """
    n_classes = logits.shape[-2]
    predictions = jnp.argmax(logits, axis=-2)
    correct = predictions == labels
    overall = jnp.mean(correct.astype(jnp.float32))

    class_ids = jnp.arange(n_classes)

    def per_class(label):
        label_mask = labels == label
        n_correct = jnp.sum((correct & label_mask).astype(jnp.float32))
        n_labels = jnp.sum(label_mask.astype(jnp.float32))
        # reference fallback: no labels of this class -> 1.0 iff also no hits
        return jnp.where(
            n_labels == 0,
            (n_correct == 0).astype(jnp.float32),
            n_correct / jnp.maximum(n_labels, 1.0),
        )

    per_class_acc = jax.vmap(per_class)(class_ids)
    return overall, per_class_acc


def iou_array(
    logits: jax.Array, labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """mIoU + per-class IoU as device arrays.

    :param logits: (..., C, N) network output before softmax.
    :param labels: (..., N) integer class labels.
    :return: (scalar mIoU, (C,) per-class IoUs)
    """
    n_classes = logits.shape[-2]
    predictions = jnp.argmax(logits, axis=-2)
    class_ids = jnp.arange(n_classes)

    def per_class(label):
        label_mask = labels == label
        pred_mask = predictions == label
        intersection = jnp.sum((pred_mask & label_mask).astype(jnp.float32))
        union = jnp.sum((pred_mask | label_mask).astype(jnp.float32))
        return jnp.where(union == 0, 1.0, intersection / jnp.maximum(union, 1.0))

    per_class_ious = jax.vmap(per_class)(class_ids)
    return jnp.mean(per_class_ious), per_class_ious


def accuracy(logits, labels) -> Tuple[float, List[float]]:
    """Reference-signature wrapper (metrics.py:8-32): host floats."""
    overall, per_class = accuracy_array(jnp.asarray(logits), jnp.asarray(labels))
    return float(overall), [float(v) for v in np.asarray(per_class)]


def iou(logits, labels) -> Tuple[float, List[float]]:
    """Reference-signature wrapper (metrics.py:35-59): host floats."""
    miou, per_class = iou_array(jnp.asarray(logits), jnp.asarray(labels))
    return float(miou), [float(v) for v in np.asarray(per_class)]


class MetricCollector:
    """Collects all metrics of an evaluation on a dataset (metrics.py:62-156)."""

    def __init__(self, class_names: Optional[List[str]] = None):
        self._class_names = class_names
        self.reset()

    def reset(self):
        self._losses: List[float] = []
        self._overall_accuracies: List[float] = []
        self._per_class_accuracies: List[np.ndarray] = []
        self._mious: List[float] = []
        self._per_class_ious: List[np.ndarray] = []

    def push(
        self,
        loss: float,
        overall_accuracy: float,
        per_class_accuracies,
        miou: float,
        per_class_ious,
    ) -> None:
        self._losses.append(float(loss))
        self._overall_accuracies.append(float(overall_accuracy))
        self._per_class_accuracies.append(np.asarray(per_class_accuracies, dtype=np.float64))
        self._mious.append(float(miou))
        self._per_class_ious.append(np.asarray(per_class_ious, dtype=np.float64))

    def as_dict(self, tag: str = "") -> OrderedDict:
        prefix = "" if tag == "" else f"{tag}_"
        dct = OrderedDict(
            {
                f"{prefix}loss": self.loss,
                f"{prefix}OA": self.overall_accuracy,
                f"{prefix}mAcc": self.mean_class_accuracy,
                f"{prefix}mIoU": self.miou,
            }
        )
        for class_idx, class_iou in enumerate(self.per_class_ious):
            key = (
                prefix + self._class_names[class_idx]
                if self._class_names
                else f"class {class_idx}"
            )
            key += " IoU"
            dct[key] = class_iou
        return dct

    @property
    def loss(self) -> float:
        return float(np.mean(self._losses))

    @property
    def overall_accuracy(self) -> float:
        return float(np.nanmean(self._overall_accuracies))

    @property
    def per_class_accuracies(self) -> List[float]:
        return list(np.nanmean(self._per_class_accuracies, axis=0))

    @property
    def mean_class_accuracy(self) -> float:
        return float(np.mean(self.per_class_accuracies))

    @property
    def miou(self) -> float:
        return float(np.nanmean(self._mious))

    @property
    def per_class_ious(self) -> List[float]:
        return list(np.nanmean(self._per_class_ious, axis=0))


class MetricCollectorBag:
    """Bundles MetricCollectors from multiple seeded evaluation runs and
    reports mean ± stdev (metrics.py:159-256)."""

    def __init__(
        self,
        metric_collectors: List[MetricCollector],
        class_names: Optional[List[str]] = None,
    ):
        self._class_names = class_names
        self._mcs = metric_collectors

    def as_dict(self, tag: str = "", include_stdev: bool = False) -> OrderedDict:
        prefix = "" if tag == "" else f"{tag}_"
        dct = OrderedDict(
            {
                f"{prefix}loss": self.loss,
                f"{prefix}OA": self.overall_accuracy,
                f"{prefix}mAcc": self.mean_class_accuracy,
                f"{prefix}mIoU": self.miou,
            }
        )
        for class_idx, class_iou in enumerate(self.per_class_ious):
            key = (
                prefix + self._class_names[class_idx]
                if self._class_names
                else f"class {class_idx}"
            )
            key += " IoU"
            dct[key] = class_iou
        if not include_stdev:
            return OrderedDict((k, v[0]) for k, v in dct.items())
        return dct

    @property
    def loss(self) -> Tuple[float, float]:
        losses = [mc.loss for mc in self._mcs]
        return float(np.mean(losses)), float(np.std(losses))

    @property
    def overall_accuracy(self) -> Tuple[float, float]:
        vals = [mc.overall_accuracy for mc in self._mcs]
        return float(np.mean(vals)), float(np.std(vals))

    @property
    def mean_class_accuracy(self) -> Tuple[float, float]:
        vals = [mc.mean_class_accuracy for mc in self._mcs]
        return float(np.mean(vals)), float(np.std(vals))

    @property
    def per_class_accuracies(self) -> List[Tuple[float, float]]:
        per = [mc.per_class_accuracies for mc in self._mcs]
        if len(per) == 0:
            return []
        arr = np.asarray(per)  # (runs, C)
        return [(float(m), float(s)) for m, s in zip(arr.mean(0), arr.std(0))]

    @property
    def miou(self) -> Tuple[float, float]:
        vals = [mc.miou for mc in self._mcs]
        return float(np.mean(vals)), float(np.std(vals))

    @property
    def per_class_ious(self) -> List[Tuple[float, float]]:
        per = [mc.per_class_ious for mc in self._mcs]
        if len(per) == 0:
            return []
        arr = np.asarray(per)  # (runs, C)
        return [(float(m), float(s)) for m, s in zip(arr.mean(0), arr.std(0))]
