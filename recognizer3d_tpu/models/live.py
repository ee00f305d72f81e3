"""Device-resident live prediction.

The reference's live loop (main.py:71-89) ships a host-dewarped,
host-filtered ~150k-point float32 cloud to the device every 250 ms. The
TPU-native loop inverts that: the RAW 1024×768 z16 depth image (1.5 MB — 8×
smaller than the dewarped cloud) is the only host→device transfer, and ONE
jitted program does

    depth -> pinhole dewarp -> z-band filter -> fixed-size random subsample
          -> consistent model subsample -> forward -> softmax
          -> full(-sampled)-cloud 1-NN upsample -> boolean mask

returning the display cloud + prediction mask (a few hundred KB back).
This is the BASELINE.json "device-resident depth→cloud→KNN preproc" config.

The dewarp is the standard pinhole model (the RealSense SDK's
``rs.pointcloud().calculate`` equivalent for the L515's rectified depth
stream): X = (u−cx)/fx·Z, Y = (v−cy)/fy·Z.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recognizer3d_tpu.data.pipeline import Z_MAX, Z_MIN, z_filter_subsample
from recognizer3d_tpu.data.preprocessing import consistent_sample_indices
from recognizer3d_tpu.ops.upsample import upsample as upsample_features


@dataclass
class DepthIntrinsics:
    """Pinhole intrinsics for the rectified depth stream (L515 defaults for
    the 1024×768 mode; replace with the device's calibration)."""

    width: int = 1024
    height: int = 768
    fx: float = 735.0
    fy: float = 735.0
    cx: float = 512.0
    cy: float = 384.0
    depth_scale: float = 0.00025  # metres per z16 unit (L515 native)


def depth_to_cloud(
    depth: jax.Array, intr: DepthIntrinsics
) -> jax.Array:
    """(H, W) z16/uint16 depth image -> (H·W, 3) float32 point cloud.
    Zero-depth pixels become (0, 0, 0), which the z-band filter drops."""
    z = depth.astype(jnp.float32) * intr.depth_scale
    u = jnp.arange(intr.width, dtype=jnp.float32)[None, :]
    v = jnp.arange(intr.height, dtype=jnp.float32)[:, None]
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


class LivePredictor:
    """Fused live-frame predictor over a loaded Model.

    ``predict_depth(depth_u16)`` -> (cloud (n_display, 3), mask (n_display,))
    where the mask is class-1 confidence > threshold (the Predictor contract,
    reference predict.py:26-31) over the device-subsampled display cloud.
    """

    def __init__(
        self,
        model,
        confidence_threshold: float = 0.5,
        n_display: int = 16384,  # UI displays <= 10k points anyway
        intrinsics: DepthIntrinsics = DepthIntrinsics(),
        z_band: Tuple[float, float] = (Z_MIN, Z_MAX),
    ):
        self._model = model
        self.confidence_threshold = confidence_threshold
        self._intr = intrinsics
        settings = model.settings
        n_points = settings.n_points
        sample_idx = jnp.asarray(
            consistent_sample_indices(n_display, n_points), jnp.int32
        )

        def program(variables, depth, key, permutation, threshold):
            cloud = depth_to_cloud(depth, intrinsics)
            pts, valid = z_filter_subsample(
                key, cloud, n_display, z_band[0], z_band[1]
            )
            sampled = jnp.take(pts, sample_idx, axis=0)[None]  # (1, n_pts, 3)
            logits = model.module.apply(
                variables, sampled, permutation, train=False
            )
            conf = jax.nn.softmax(logits, axis=-2)  # (1, C, n_pts)
            conf_up = upsample_features(
                jnp.swapaxes(conf, -1, -2),
                sampled[..., :3],
                pts[None],
                approach=settings.upsampling,
                knn_approach=settings.knn if settings.knn != "kdtree" else "naive",
            )[0]  # (n_display, C)
            mask = (conf_up[:, 1] > threshold) & valid
            return pts, mask

        self.program_fn = program  # un-jitted (benchmarks chain it)
        self._program = jax.jit(program)
        self._frame_counter = 0
        # warmup (jit compile — the reference's "first prediction is always
        # much slower" workaround, predict.py:22-24)
        dummy = jnp.zeros(
            (intrinsics.height, intrinsics.width), jnp.uint16
        )
        self.predict_depth(np.asarray(dummy))

    def predict_depth(self, depth: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """One live frame: (display cloud (n_display, 3), boolean mask)."""
        self._frame_counter += 1
        key = jax.random.PRNGKey(self._frame_counter)
        permutation = np.random.permutation(
            self._model.settings.n_points
        ).astype(np.int32)
        pts, mask = self._program(
            self._model.variables,
            jnp.asarray(depth, jnp.uint16),
            key,
            permutation,
            jnp.float32(self.confidence_threshold),
        )
        return np.asarray(pts), np.asarray(mask)
