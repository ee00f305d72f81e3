"""Segmentation losses in pure jnp.

Numerical semantics match the reference loss zoo
(``/root/reference/randlanet/utils/losses.py`` and the dispatch table in
``trainer.py:244-269``):

- ``cross_entropy``  — mean softmax cross-entropy over all points
- ``focal``          — FocalLoss(gamma=2), one-hot + clamp(eps), sum/(B*N)
- ``dice``           — FocalTversky(alpha=0.5, gamma=1)   (== Dice)
- ``tversky``        — FocalTversky(alpha=0.7, gamma=1)
- ``focal_tversky``  — FocalTversky(alpha=0.7, gamma=4/3)

All Tversky variants exclude class 0 ("neglect_background", losses.py:73-75).
Every loss takes ``logits (B, C, N)`` and integer ``labels (B, N)`` and
returns a scalar — fully jit/grad-compatible.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

EPS = 1e-7


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross entropy (torch.nn.CrossEntropyLoss semantics)."""
    log_probs = jax.nn.log_softmax(logits, axis=-2)  # (B, C, N)
    picked = jnp.take_along_axis(log_probs, labels[..., None, :], axis=-2)
    return -jnp.mean(picked)


def focal_loss(
    logits: jax.Array, labels: jax.Array, gamma: float = 2.0
) -> jax.Array:
    """Focal loss (losses.py:7-34): CE·(1−p)^γ summed, normalised by B·N."""
    n_classes = logits.shape[-2]
    # labels (B, N) -> one-hot (B, C, N), clamped like the reference
    y_true = jax.nn.one_hot(labels, n_classes, axis=-1)  # (B, N, C)
    y_true = jnp.moveaxis(y_true, -1, -2)  # (B, C, N)
    y_true = jnp.clip(y_true, EPS, 1.0 - EPS)
    y_pred = jax.nn.softmax(logits, axis=-2)
    y_pred = jnp.clip(y_pred, EPS, 1.0 - EPS)
    cross_entropy = -y_true * jnp.log(y_pred)
    focal = cross_entropy * (1.0 - y_pred) ** gamma
    b, _, n = logits.shape
    return jnp.sum(focal) / (b * n)


def focal_tversky_loss(
    logits: jax.Array,
    labels: jax.Array,
    alpha: float = 0.7,
    gamma: float = 4.0 / 3.0,
    neglect_background: bool = True,
) -> jax.Array:
    """Focal Tversky loss (losses.py:37-87).

    Generalises (i) Dice when alpha=0.5, gamma=1 and (ii) Tversky when
    gamma=1. TP/FN/FP are accumulated per class over all batch points.
    """
    n_classes = logits.shape[-2]
    y_true = jax.nn.one_hot(labels, n_classes, axis=-1)  # (B, N, C)
    y_true = jnp.moveaxis(y_true, -1, -2)  # (B, C, N)
    y_pred = jax.nn.softmax(logits, axis=-2)
    # (C, B*N) — flatten batch into the point dimension (losses.py:71-72)
    y_true = jnp.reshape(jnp.swapaxes(y_true, 0, 1), (n_classes, -1))
    y_pred = jnp.reshape(jnp.swapaxes(y_pred, 0, 1), (n_classes, -1))
    if neglect_background:
        y_true = y_true[1:, :]
        y_pred = y_pred[1:, :]
    true_pos = jnp.sum(y_true * y_pred, axis=1)
    false_neg = jnp.sum(y_true * (1.0 - y_pred), axis=1)
    false_pos = jnp.sum((1.0 - y_true) * y_pred, axis=1)
    tversky_index = (true_pos + EPS) / (
        true_pos + alpha * false_neg + (1.0 - alpha) * false_pos + EPS
    )
    return jnp.mean((1.0 - tversky_index) ** gamma)


def get_loss(loss_function: str) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Loss dispatch with the reference's standard parameters
    (trainer.py:244-269)."""
    if loss_function == "cross_entropy":
        return cross_entropy_loss
    elif loss_function == "focal":
        return partial(focal_loss, gamma=2.0)
    elif loss_function == "dice":
        return partial(
            focal_tversky_loss, alpha=0.5, gamma=1.0, neglect_background=True
        )
    elif loss_function == "tversky":
        return partial(
            focal_tversky_loss, alpha=0.7, gamma=1.0, neglect_background=True
        )
    elif loss_function == "focal_tversky":
        return partial(
            focal_tversky_loss,
            alpha=0.7,
            gamma=4.0 / 3.0,
            neglect_background=True,
        )
    else:
        raise ValueError(f"Loss function {loss_function} not known!")
