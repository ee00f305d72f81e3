"""Point-cloud augmentation.

Semantics match the reference (``/root/reference/randlanet/utils/augmentation.py``):
jitter (scaled by mean cloud radius, clipped) → random scale about centroid →
random small-angle Rz·Ry·Rx rotation about centroid → random shift (scaled by
radius), composed in that order (augmentation.py:143-167).

Two implementations:

- numpy functions using the global numpy RNG — drop-in parity for the host
  data-loading path;
- :func:`perturbate_point_cloud_device` — a pure, jit-able, batched jax
  version keyed by an explicit PRNG key, used by the device-resident input
  pipeline so augmentation runs on TPU instead of per-sample python.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class AugmentationSettings:
    #: Variance of random perturbation of single points
    jitter_variance: float = 0.01
    #: Clip value of random perturbation of single points
    jitter_limit: float = 0.05
    #: Maximum scale for random scaling of the point cloud.
    #: Scale will be randomly selected from [1 - scale_limit, 1 + scale_limit]
    scale_limit: float = 0.2
    #: Maximum translation for random shifting the point cloud
    shift_limit: float = 0.1
    #: Variances of random rotation around x, y and z axes respectively (rad)
    rotation_angle_variances: Tuple[float, float, float] = (0.06, 0.06, 0.06)
    #: Clip values of random rotation around x, y and z axes respectively (rad)
    rotation_angle_limits: Tuple[float, float, float] = (0.18, 0.18, 0.18)


def get_mean_radius(xyz: np.ndarray) -> float:
    """Mean distance to the cloud center (augmentation.py:24-32)."""
    center = np.mean(xyz, axis=0, keepdims=True)
    return float(np.mean(np.linalg.norm(xyz - center, axis=1)))


def jitter_point_cloud(
    xyz: np.ndarray, variance: float = 0.01, limit: float = 0.05
) -> np.ndarray:
    """Per-point gaussian jitter scaled by mean radius, clipped (aug.py:35-54)."""
    radius = get_mean_radius(xyz)
    perturbation = np.clip(
        radius * variance * np.random.randn(xyz.shape[0], xyz.shape[1]),
        -limit,
        limit,
    )
    return xyz + perturbation


def random_scale_point_cloud(xyz: np.ndarray, scale_limit: float = 0.2) -> np.ndarray:
    """Uniform random scale about the centroid (aug.py:57-76)."""
    scale = np.random.uniform(1 - scale_limit, 1 + scale_limit)
    center = np.mean(xyz, axis=0, keepdims=True)
    return (xyz - center) * scale + center


def _rotation_matrix(angles) -> np.ndarray:
    """R = Rz @ Ry @ Rx for the given xyz euler angles (aug.py:99-120)."""
    ax, ay, az = angles
    Rx = np.array(
        [[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]]
    )
    Ry = np.array(
        [[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]]
    )
    Rz = np.array(
        [[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]]
    )
    return Rz @ Ry @ Rx


def random_rotate_point_cloud(
    xyz: np.ndarray,
    angle_variances: Tuple[float, float, float] = (0.06, 0.06, 0.06),
    angle_limits: Tuple[float, float, float] = (0.18, 0.18, 0.18),
) -> np.ndarray:
    """Small random rotation about the centroid (aug.py:79-124)."""
    assert len(angle_variances) == 3, "angle variances should have length 3"
    assert len(angle_limits) == 3, "angle limits should have length 3"
    angles = [
        np.clip(sigma * np.random.randn(), -limit, limit)
        for sigma, limit in zip(angle_variances, angle_limits)
    ]
    R = _rotation_matrix(angles)
    center = np.mean(xyz, axis=0, keepdims=True)
    return (xyz - center) @ R.T + center


def random_shift_point_cloud(xyz: np.ndarray, shift_limit: float = 0.1) -> np.ndarray:
    """Uniform random shift scaled by mean radius (aug.py:127-140)."""
    radius = get_mean_radius(xyz)
    shifts = radius * np.random.uniform(-shift_limit, shift_limit, 3)
    return xyz + shifts


def perturbate_point_cloud(
    xyz: np.ndarray, settings: AugmentationSettings
) -> np.ndarray:
    """Full augmentation composition (aug.py:143-167)."""
    xyz = jitter_point_cloud(xyz, settings.jitter_variance, settings.jitter_limit)
    xyz = random_scale_point_cloud(xyz, settings.scale_limit)
    xyz = random_rotate_point_cloud(
        xyz, settings.rotation_angle_variances, settings.rotation_angle_limits
    )
    xyz = random_shift_point_cloud(xyz, settings.shift_limit)
    return xyz


# --------------------------------------------------------------------------
# Device-resident (jit-able, batched) augmentation
# --------------------------------------------------------------------------


def _perturbate_single_device(
    key: jax.Array, xyz: jax.Array, settings: AugmentationSettings
) -> jax.Array:
    """jax version of the augmentation composition for one (N, 3) cloud."""
    k_jit, k_scale, k_rot, k_shift = jax.random.split(key, 4)

    # jitter — radius computed on the *input* cloud, like the reference
    center = jnp.mean(xyz, axis=0, keepdims=True)
    radius = jnp.mean(jnp.linalg.norm(xyz - center, axis=1))
    noise = jnp.clip(
        radius * settings.jitter_variance * jax.random.normal(k_jit, xyz.shape),
        -settings.jitter_limit,
        settings.jitter_limit,
    )
    xyz = xyz + noise

    # scale about centroid
    scale = jax.random.uniform(
        k_scale, (), minval=1 - settings.scale_limit, maxval=1 + settings.scale_limit
    )
    center = jnp.mean(xyz, axis=0, keepdims=True)
    xyz = (xyz - center) * scale + center

    # rotation about centroid
    sigmas = jnp.asarray(settings.rotation_angle_variances)
    limits = jnp.asarray(settings.rotation_angle_limits)
    angles = jnp.clip(sigmas * jax.random.normal(k_rot, (3,)), -limits, limits)
    cx, cy, cz = jnp.cos(angles[0]), jnp.cos(angles[1]), jnp.cos(angles[2])
    sx, sy, sz = jnp.sin(angles[0]), jnp.sin(angles[1]), jnp.sin(angles[2])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    R = Rz @ Ry @ Rx
    center = jnp.mean(xyz, axis=0, keepdims=True)
    xyz = (xyz - center) @ R.T + center

    # shift scaled by the (post-rotation) mean radius
    center = jnp.mean(xyz, axis=0, keepdims=True)
    radius = jnp.mean(jnp.linalg.norm(xyz - center, axis=1))
    shifts = radius * jax.random.uniform(
        k_shift, (3,), minval=-settings.shift_limit, maxval=settings.shift_limit
    )
    return xyz + shifts


def perturbate_point_cloud_device(
    key: jax.Array, xyz: jax.Array, settings: AugmentationSettings
) -> jax.Array:
    """Batched device augmentation.

    :param key: PRNG key (split per batch element).
    :param xyz: (B, N, 3) or (N, 3) coordinates.
    :param settings: augmentation settings (static).
    :return: augmented coordinates, same shape.
    """
    if xyz.ndim == 2:
        return _perturbate_single_device(key, xyz, settings)
    keys = jax.random.split(key, xyz.shape[0])
    return jax.vmap(lambda k, x: _perturbate_single_device(k, x, settings))(
        keys, xyz
    )
