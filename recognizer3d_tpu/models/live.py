"""Device-resident live prediction.

The reference's live loop (main.py:71-89) ships a host-dewarped,
host-filtered ~150k-point float32 cloud to the device every 250 ms. The
TPU-native loop inverts that: the RAW 1024×768 z16 depth image (1.5 MB — 8×
smaller than the dewarped cloud) is the only host→device transfer, and ONE
jitted program does

    depth -> pinhole dewarp -> z-band filter -> fixed-size random subsample
          -> consistent model subsample -> forward -> softmax
          -> full(-sampled)-cloud 1-NN upsample -> boolean mask

returning the display cloud + prediction mask as ONE packed float16 array
(a single device→host transfer — on remote-TPU setups every separate
download pays a relay round-trip). This is the BASELINE.json
"device-resident depth→cloud→KNN preproc" config; ``main.py`` drives it
whenever the connected camera exposes raw depth
(``Camera.depth_intrinsics``/``last_depth``).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recognizer3d_tpu.data.pipeline import (
    DepthIntrinsics,
    Z_MAX,
    Z_MIN,
    depth_to_cloud,
    z_filter_subsample,
)
from recognizer3d_tpu.data.preprocessing import consistent_sample_indices
from recognizer3d_tpu.ops.upsample import upsample as upsample_features
from recognizer3d_tpu.utils.host_rng import host_threefry_keys

__all__ = ["DepthIntrinsics", "LivePredictor", "depth_to_cloud"]


class LivePredictor:
    """Fused live-frame predictor over a loaded Model.

    ``predict_depth(depth_u16)`` -> (cloud (n_display, 3), mask (n_display,))
    where the mask is class-1 confidence > threshold (the Predictor contract,
    reference predict.py:26-31) over the device-subsampled display cloud.

    Per frame, the host does exactly: one permutation draw + one threefry key
    draw (numpy), ONE upload (the z16 frame), ONE program dispatch, ONE
    download (the packed f16 cloud+mask — display precision; the f16
    quantization ~0.3 mm is below the sensor's depth noise).
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
        #: bytes of the packed (n_display, 4) f16 per-frame download
        #: (bench.py's transport-model decomposition)
        self._n_display_bytes = n_display * 4 * 2
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
            # pack xyz + mask into one (n_display, 4) f16 array: a single
            # D2H transfer per frame (two separate downloads = two relay
            # round-trips); f16 is display precision, the mask is 0/1 exact
            return jnp.concatenate(
                [pts, mask[:, None].astype(jnp.float32)], axis=-1
            ).astype(jnp.float16)

        from recognizer3d_tpu.models.facade import _GuardedJit

        self.program_fn = program  # un-jitted (benchmarks chain it)
        # epoch-keyed jit: retraces if the session recall guard widens the
        # approximate-KNN window / demotes to exact (ops/knn.session_epoch)
        self._program = _GuardedJit(program)
        # host RNG: a device-side PRNGKey would be one extra tiny dispatch
        # (a relay RTT) per frame; numpy-drawn uint32 pairs are valid
        # threefry keys (utils/host_rng.py)
        self._rng = np.random.RandomState(0)
        # warmup (jit compile — the reference's "first prediction is always
        # much slower" workaround, predict.py:22-24). The all-zero dummy
        # frame must NOT feed the recall guard (degenerate geometry).
        self._warm = False
        dummy = np.zeros((intrinsics.height, intrinsics.width), np.uint16)
        self.predict_depth(dummy)
        self._warm = True

    def _threshold_scalar(self):
        """Device-resident confidence threshold, re-uploaded only when the
        value changes: a fresh ``jnp.float32(x)`` per frame is a separate
        4-byte host→device transfer — measured ~1 ms/frame through the
        axon relay (benchmarks/live_transport_ablation.json,
        resident vs jnp_scalar variants)."""
        val = float(self.confidence_threshold)
        cached = getattr(self, "_thr_cache", None)
        if cached is None or cached[0] != val:
            self._thr_cache = (val, jax.device_put(jnp.float32(val)))
        return self._thr_cache[1]

    def predict_depth(self, depth: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """One live frame: (display cloud (n_display, 3) f32, boolean mask)."""
        key = host_threefry_keys(self._rng)
        permutation = np.random.permutation(
            self._model.settings.n_points
        ).astype(np.int32)
        packed = np.asarray(
            self._program(
                self._model.variables,
                jnp.asarray(depth, jnp.uint16),
                key,
                permutation,
                self._threshold_scalar(),
            )
        )
        cloud = packed[:, :3].astype(np.float32)
        if self._warm and not self._model._recall_guard_ran:
            # session-first REAL frame: probe the capture distribution
            # (VERDICT r4 #1). If the guard widens the window, the next
            # frame's _GuardedJit call retraces with the new routing.
            self._model._maybe_run_recall_guard(cloud)
        return cloud, packed[:, 3] > 0
