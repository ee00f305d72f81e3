"""Device-resident input pipeline.

The reference does all preprocessing per-sample in Python on the host
(z-filter in the camera layer, subsample/normalize/augment in the torch
Dataset adapter — SURVEY.md §2.7, §3.2 "HOT: CPU preproc"). Here the entire
stage runs as jit programs on the TPU:

- :func:`z_filter_subsample` — raw sensor frame → z-band filter + random
  fixed-size subsample in ONE fused program (the live loop's preprocessing,
  replacing camera/realsense_camera.py:117-118 + model.py:211-215 host work);
- :func:`normalize_cloud_device` — center + radius normalization
  (mean/max/stdev, utils/dataset.py:81-92 semantics);
- :class:`DeviceDatasetCache` — the training-side pipeline: the whole
  dataset lives padded in HBM; each step draws, subsamples and augments a
  batch on device, so the host never touches point data during training.
"""

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recognizer3d_tpu.utils.host_rng import host_threefry_keys
from recognizer3d_tpu.data.augmentation import (
    AugmentationSettings,
    perturbate_point_cloud_device,
)

Z_MIN, Z_MAX = 0.05, 0.6  # reference camera z band (realsense_camera.py:117)


@dataclass
class DepthIntrinsics:
    """Pinhole intrinsics for a rectified depth stream. Defaults are the
    L515's 1024×768 mode; production cameras report their calibration
    (``RealsenseCamera.depth_intrinsics`` queries the SDK)."""

    width: int = 1024
    height: int = 768
    fx: float = 735.0
    fy: float = 735.0
    cx: float = 512.0
    cy: float = 384.0
    depth_scale: float = 0.00025  # metres per z16 unit (L515 native)


def depth_to_cloud(depth: jax.Array, intr: DepthIntrinsics) -> jax.Array:
    """(H, W) z16/uint16 depth image -> (H·W, 3) float32 point cloud, on
    device. The standard pinhole dewarp (the RealSense SDK's
    ``rs.pointcloud().calculate`` equivalent for the rectified stream):
    X = (u−cx)/fx·Z, Y = (v−cy)/fy·Z. Zero-depth pixels become (0, 0, 0),
    which the z-band filter drops."""
    z = depth.astype(jnp.float32) * intr.depth_scale
    u = jnp.arange(intr.width, dtype=jnp.float32)[None, :]
    v = jnp.arange(intr.height, dtype=jnp.float32)[:, None]
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


def cloud_to_depth(cloud: np.ndarray, intr: DepthIntrinsics) -> np.ndarray:
    """Inverse pinhole projection, host-side: (N, 3) xyz -> (H, W) z16
    depth image, nearest point per pixel (z-buffer). Stored captures hold
    DEWARPED clouds, not raw depth — this reconstructs a raw frame from
    them so the device-resident depth path can be replayed/benchmarked/
    tested with no sensor attached (mock_camera.DepthReplayCamera)."""
    cloud = np.asarray(cloud, np.float32)
    z = cloud[:, 2]
    ok = z > 0
    u = np.round(cloud[ok, 0] / z[ok] * intr.fx + intr.cx).astype(np.int64)
    v = np.round(cloud[ok, 1] / z[ok] * intr.fy + intr.cy).astype(np.int64)
    inb = (u >= 0) & (u < intr.width) & (v >= 0) & (v < intr.height)
    zbuf = np.full(intr.height * intr.width, np.inf, np.float32)
    np.minimum.at(zbuf, v[inb] * intr.width + u[inb], z[ok][inb])
    zbuf[~np.isfinite(zbuf)] = 0.0
    z16 = np.round(zbuf / intr.depth_scale).clip(0, 65535).astype(np.uint16)
    return z16.reshape(intr.height, intr.width)


def z_filter_subsample(
    key: jax.Array,
    raw: jax.Array,
    n_out: int,
    z_min: float = Z_MIN,
    z_max: float = Z_MAX,
) -> Tuple[jax.Array, jax.Array]:
    """Filter a raw frame to the z band and randomly subsample to a fixed
    size, fully on device.

    Invalid/filtered points get +inf priority, valid points a uniform random
    priority; taking the n_out smallest priorities yields a uniform random
    subset of the valid points (and deterministically pads with invalid
    points only when fewer than n_out are valid).

    :param raw: (N_raw, 3) or (B, N_raw, 3) raw sensor points (zeros =
                invalid, like the RealSense SDK emits).
    :param n_out: static output size.
    :return: (points (..., n_out, 3), valid (..., n_out) bool mask).
    """
    batched = raw.ndim == 3
    if not batched:
        raw = raw[None]
    b, n_raw, _ = raw.shape
    z = raw[..., 2]
    valid = (z > z_min) & (z < z_max)
    priority = jnp.where(
        valid, jax.random.uniform(key, (b, n_raw)), jnp.inf
    )
    if jax.devices()[0].platform == "tpu":
        # selecting n_out of the RANDOM priorities: the approximate top-k
        # (TPU PartialReduce hardware) returns a uniformly random valid
        # subset just as well as the exact one, ~10x faster at this k
        _, order = jax.lax.approx_min_k(priority, n_out, recall_target=0.95)
    else:
        _, order = jax.lax.top_k(-priority, n_out)  # n_out smallest
    points = jnp.take_along_axis(raw, order[..., None], axis=1)
    valid_out = jnp.take_along_axis(valid, order, axis=1)
    points = jnp.where(valid_out[..., None], points, 0.0)
    if not batched:
        return points[0], valid_out[0]
    return points, valid_out


def normalize_cloud_device(
    xyz: jax.Array, normalization: Optional[str]
) -> jax.Array:
    """Center + radius normalization (mean/max/stdev), batched, jit-able."""
    if normalization is None:
        return xyz
    center = jnp.mean(xyz, axis=-2, keepdims=True)
    xyz = xyz - center
    norms = jnp.linalg.norm(xyz, axis=-1)
    if normalization == "mean":
        radius = jnp.mean(norms, axis=-1)
    elif normalization == "max":
        radius = jnp.max(norms, axis=-1)
    elif normalization == "stdev":
        radius = jnp.std(norms, axis=-1)
    else:
        radius = jnp.ones(norms.shape[:-1], xyz.dtype)
    return xyz / radius[..., None, None]


class DeviceDatasetCache:
    """Training data resident in HBM with on-device batch assembly.

    Host work happens ONCE (load + pad the dataset); afterwards
    :meth:`sample_batch` is a single jit program per step: per-sample random
    subsample to ``n_points`` (valid-mask aware) + optional augmentation.
    """

    def __init__(
        self,
        dataset: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
        n_points: int,
        augmentation_settings: Optional[AugmentationSettings] = None,
        mesh=None,
    ):
        """:param mesh: optional ``jax.sharding.Mesh`` — the padded dataset
        tables are replicated over it so batch assembly can run inside
        SPMD programs (the data-parallel fused epoch scan)."""
        clouds, labels = [], []
        n_max = 0
        for i in range(len(dataset)):
            xyz, _feats, lab = dataset[i]
            if xyz.shape[0] == 0:
                # fail loudly here: on device, a zero-point sample would
                # silently degenerate into n_points duplicates of a
                # zero-padded table row (origin points labelled background)
                raise ValueError(
                    f"dataset sample {i} has zero points; remove or re-capture "
                    "it before training"
                )
            clouds.append(np.asarray(xyz, dtype=np.float32))
            labels.append(np.asarray(lab, dtype=np.int32))
            n_max = max(n_max, xyz.shape[0])
        self.n_samples = len(clouds)
        self.n_points = n_points
        self._augmentation = augmentation_settings

        # table at least n_points wide so the top_k selection below is
        # well-formed even when every cloud is shorter than n_points
        n_max = max(n_max, n_points)
        xyz_pad = np.zeros((self.n_samples, n_max, 3), np.float32)
        lab_pad = np.zeros((self.n_samples, n_max), np.int32)
        valid = np.zeros((self.n_samples, n_max), bool)
        for i, (c, l) in enumerate(zip(clouds, labels)):
            xyz_pad[i, : len(c)] = c
            lab_pad[i, : len(l)] = l
            valid[i, : len(c)] = True
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            put = lambda x: jax.device_put(x, replicated)
        else:
            put = jax.device_put
        self._xyz = put(xyz_pad)
        self._labels = put(lab_pad)
        self._valid = put(valid)

        def _sample_one(key, xyz, labels, valid):
            k_sel, k_dup, k_aug = jax.random.split(key, 3)
            priority = jnp.where(
                valid, jax.random.uniform(k_sel, valid.shape), jnp.inf
            )
            _, order = jax.lax.top_k(-priority, n_points)
            # clouds shorter than n_points: top_k's tail picks invalid
            # (zero-padded) rows. Replace them with random duplicates of
            # the selected real points — the host sampler's contract
            # (preprocessing.sample_points pads with replacement; reference
            # preprocessing.py:35-62) — instead of injecting origin points.
            n_valid = jnp.sum(valid)
            n_real = jnp.maximum(jnp.minimum(n_valid, n_points), 1)
            dup_pos = jax.random.randint(k_dup, (n_points,), 0, n_real)
            order = jnp.where(
                jnp.arange(n_points) < n_valid, order, order[dup_pos]
            )
            pts = xyz[order]
            labs = labels[order]
            if augmentation_settings is not None:
                pts = perturbate_point_cloud_device(
                    k_aug, pts, augmentation_settings
                )
            return pts, labs

        def _sample_batch(key, sample_ids):
            keys = jax.random.split(key, sample_ids.shape[0])
            return jax.vmap(
                lambda k, i: _sample_one(
                    k, self._xyz[i], self._labels[i], self._valid[i]
                )
            )(keys, sample_ids)

        #: pure (key, (B,) sample_ids) -> (inputs, labels) — usable inside a
        #: larger jitted program (the trainer's fused epoch scan)
        self.sample_batch_fn = _sample_batch
        self._sample_batch_jit = jax.jit(_sample_batch)

    def sample_batch(
        self, key: jax.Array, sample_ids: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """(inputs (B, n_points, 3), labels (B, n_points)) on device."""
        return self._sample_batch_jit(key, jnp.asarray(sample_ids))

    def epoch_batches(self, key: jax.Array, batch_size: int):
        """Yield shuffled (inputs, labels) device batches covering the
        dataset once (remainder batch included, like the host loader).

        The shuffle and per-batch key derivation run on the HOST (numpy
        seeded from ``key``): on remote-TPU setups every tiny jax.random
        dispatch pays a relay round-trip, and only ``sample_batch`` itself
        is real device work. The uint32 pairs drawn here are valid threefry
        keys for the jitted sampler."""
        rng = np.random.RandomState(np.asarray(key, dtype=np.uint32))
        order = rng.permutation(self.n_samples).astype(np.int32)
        for start in range(0, self.n_samples, batch_size):
            ids = order[start : start + batch_size]
            yield self.sample_batch(host_threefry_keys(rng), ids)
