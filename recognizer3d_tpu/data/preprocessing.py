"""Point sampling utilities.

Behavioural parity with the reference's host-side samplers
(``/root/reference/randlanet/utils/preprocessing.py``), including the
"consistent sampling" determinism contract (seed-0 with global-RNG-state
save/restore, preprocessing.py:23-31) that the reference relies on for
reproducible predict/eval.

Two implementations live here:

- numpy versions (``sample_points`` & friends) — byte-identical sampling
  behaviour to the reference for the host data-loading path; consistent
  indices depend only on ``(n_points, n_sample_points)``, so callers may
  cache them.
- ``sample_points_device`` — a jit-friendly jax.random version used by the
  device-resident pipeline, keyed by an explicit PRNG key instead of global
  numpy state (the TPU-native determinism mechanism).
"""

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def random_choice(
    a: int,
    size: int,
    replace: bool = True,
    p: Optional[np.ndarray] = None,
    consistent: bool = False,
) -> np.ndarray:
    """Random choice; when ``consistent`` is set, temporarily reseeds the
    global numpy RNG to 0 and restores its state afterwards — the same
    determinism contract as the reference (preprocessing.py:6-32)."""
    if consistent:
        rnd_state = np.random.get_state()
        np.random.seed(0)
    value = np.random.choice(a, size, replace, p)
    if consistent:
        np.random.set_state(rnd_state)
    return value


def sample_points(
    n_points: int, n_sample_points: int, consistent: bool = False
) -> np.ndarray:
    """Random sub- or upsample point indices (preprocessing.py:35-62).

    Samples without replacement while possible; when more points are asked
    for than exist, pads with random duplicates (with replacement).
    """
    sample_indices = random_choice(
        n_points,
        min(n_sample_points, n_points),
        replace=False,
        consistent=consistent,
    )
    if n_sample_points > n_points:
        n_points_dupl = n_sample_points - n_points
        sample_indices_dupl = random_choice(
            n_points, n_points_dupl, replace=True, consistent=consistent
        )
        sample_indices = np.r_[sample_indices, sample_indices_dupl]
    return sample_indices


@lru_cache(maxsize=64)
def consistent_sample_indices(n_points: int, n_sample_points: int) -> np.ndarray:
    """Cached consistent (seed-0) sample indices.

    Because consistent sampling always reseeds to 0, the resulting indices
    are a pure function of (n_points, n_sample_points); caching them removes
    the host RNG from the live predict loop entirely.
    """
    out = sample_points(n_points, n_sample_points, consistent=True)
    out.setflags(write=False)
    return out


def sample_points_balanced(
    labels, n_sample_points: int, consistent: bool = False
) -> np.ndarray:
    """Sampling weighted toward under-represented classes
    (preprocessing.py:65-107): each point draws with probability
    proportional to the number of points NOT in its class, so minority-
    class points are oversampled. With a single class present this
    degenerates to uniform sampling (the reference's intent; its one-hot
    formulation divides 0/0 there — this version takes the uniform path
    explicitly)."""
    labels = np.asarray(labels).ravel()
    n_points = labels.size
    _, class_of, counts = np.unique(
        labels, return_inverse=True, return_counts=True
    )
    weight_per_class = (n_points - counts).astype(np.float64)
    if not weight_per_class.all():  # single class -> uniform
        return random_choice(n_points, n_sample_points, consistent=consistent)
    weights = weight_per_class[class_of]
    return random_choice(
        n_points,
        n_sample_points,
        p=weights / weights.sum(),
        consistent=consistent,
    )


def sample_points_equal(
    labels, n_sample_points: int, ratio: float = 1.0, consistent: bool = False
) -> np.ndarray:
    """Per-class quota sampling (preprocessing.py:110-171): each class's
    quota blends an equal share (``ratio=1``) with its proportional share
    (``ratio=0``); rounding drift lands on the largest quota. Within a
    class, indices draw without replacement, padded with duplicates when
    the quota exceeds the class size."""
    labels = np.asarray(labels).ravel()
    classes, counts = np.unique(labels, return_counts=True)
    equal_share = int(np.round(n_sample_points / classes.size))
    prop_share = np.round(
        counts * (n_sample_points / labels.size)
    ).astype(np.int64)
    quota = np.round(
        ratio * equal_share + (1.0 - ratio) * prop_share
    ).astype(np.int64)
    quota[np.argmax(quota)] += n_sample_points - quota.sum()

    picks = []
    for cls, n_cls, want in zip(classes, counts, quota):
        pool = np.flatnonzero(labels == cls)
        ind = random_choice(
            n_cls, min(want, n_cls), replace=False, consistent=consistent
        )
        if want > n_cls:
            extra = random_choice(
                n_cls, want - n_cls, replace=True, consistent=consistent
            )
            ind = np.concatenate([ind, extra])
        picks.append(pool[ind])
    return np.concatenate(picks)


def sample_points_factor(
    n_points: int, factor: float = 0.25, consistent: bool = False
) -> np.ndarray:
    """Fractional sampling (preprocessing.py:174-201)."""
    n_sample_points = int(n_points * factor)
    return sample_points(n_points, n_sample_points, consistent=consistent)


def sample_points_device(
    key: jax.Array, n_points: int, n_sample_points: int
) -> jax.Array:
    """Device-side random sample indices (int32, shape (n_sample_points,)).

    jit-friendly analogue of :func:`sample_points`: a random permutation
    prefix (without replacement) padded, when upsampling, with uniform
    duplicates. Shapes are static — both sizes are Python ints.
    """
    k_perm, k_dupl = jax.random.split(key)
    n_base = min(n_sample_points, n_points)
    perm = jax.random.permutation(k_perm, n_points)[:n_base]
    if n_sample_points > n_points:
        dupl = jax.random.randint(
            k_dupl, (n_sample_points - n_points,), 0, n_points
        )
        perm = jnp.concatenate([perm, dupl])
    return perm.astype(jnp.int32)


def normalize_cloud(xyz: np.ndarray, normalization: Optional[str]) -> np.ndarray:
    """Center + radius normalization (utils/dataset.py:81-92).

    ``normalization`` in {None, "mean", "max", "stdev"}; any other string
    centers without scaling (radius 1.0), matching the reference's fallthrough.
    """
    if normalization is None:
        return xyz
    center = np.mean(xyz, axis=0, keepdims=True)
    xyz = xyz - center
    norms = np.linalg.norm(xyz, axis=1)
    if normalization == "mean":
        radius = np.mean(norms)
    elif normalization == "max":
        radius = np.max(norms)
    elif normalization == "stdev":
        radius = np.std(norms)
    else:
        radius = 1.0
    return xyz / radius
