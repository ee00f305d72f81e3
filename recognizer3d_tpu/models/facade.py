"""Model facade: save/load/predict/train/evaluate.

API parity with the reference facade (``/root/reference/randlanet/model.py``):
same method signatures, same serialized archive layout (a zip containing a
``config`` JSON and a ``model`` weights payload, model.py:107-121), same
predict pre/post-processing contract (consistent subsample → forward →
softmax → upsample onto the full cloud, model.py:146-235).

TPU specifics:

- the forward pass, softmax and the full-cloud upsampling are separate jitted
  programs so the (fixed-shape) network compile is reused across varying live
  frame sizes; full clouds are padded to proportional buckets (steps of up
  to 1/8 of the size, min 4096) to bound the number of compilations in the
  250 ms live loop;
- ``load`` transparently accepts BOTH this framework's archives (msgpack
  weights) and original PyTorch reference archives (torch state_dict),
  converting the latter via models/torch_compat.py — pretrained reference
  models run on TPU as-is;
- the "consistent sampling" indices are a pure function of the cloud size,
  so they are cached host-side (data/preprocessing.py) and the live loop
  pays no host RNG cost.
"""

import json
import logging
import os
import shutil
import tempfile
from dataclasses import asdict
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from flax import serialization as flax_serialization

from recognizer3d_tpu.data.augmentation import AugmentationSettings
from recognizer3d_tpu.data.loader import get_data_loader
from recognizer3d_tpu.data.preprocessing import consistent_sample_indices
from recognizer3d_tpu.models.large import (
    LARGE_FORWARD_MIN_POINTS,
    forward_eval_large,
)
from recognizer3d_tpu.models.randlanet import RandLANet
from recognizer3d_tpu.models.settings import RandLANetSettings
from recognizer3d_tpu.ops import knn as knn_ops
from recognizer3d_tpu.ops.knn import FAST_GATHER_MAX_ROWS
from recognizer3d_tpu.ops.upsample import upsample as upsample_features

_BUCKET = 4096  # minimum full-cloud padding granularity
# eval forwards at / beyond this cloud size stream the LFA neighbour
# pipeline in chunks (models/large.py) so 1M-point clouds fit in HBM
_LARGE_FORWARD_MIN = LARGE_FORWARD_MIN_POINTS
# batched eval forwards with more total points than this run per cloud
# (lax.map): batched row gathers leave the fast-gather regime past ~128k
# table rows (benchmarks/RESULTS.md "Batched row gathers")
_BATCHED_PER_CLOUD_MIN = FAST_GATHER_MAX_ROWS


def _bucket(n: int) -> int:
    """Round a full-cloud size up to its bucket. Buckets are proportional
    (steps of up to 1/8 of the size, at least 4096): camera frames vary by
    a few percent frame-to-frame after the z-filter, and a fixed fine
    granularity would recompile the predict program for nearly every
    distinct size (remote TPU compiles cost ~1-2 min). Padding waste is
    bounded at ~12.5%."""
    if n <= _BUCKET:
        return _BUCKET
    step = max(_BUCKET, 1 << (int(n).bit_length() - 4))
    return -(-n // step) * step


class _GuardedJit:
    """``jax.jit`` whose compiled-program cache keys on the KNN session
    guard epoch (``ops/knn.session_epoch``): the approximate-KNN window
    size / exact demotion are read at TRACE time, so a program traced
    before the guard acted would silently keep the stale routing. The
    epoch check is one dict read per call; a retrace happens at most a
    couple of times per session (guard widen / fallback)."""

    def __init__(self, fn):
        self._fn = fn
        self._epoch = None
        self._jit = None

    @property
    def fn(self):
        """The wrapped un-jitted function (benchmarks lower/chain it)."""
        return self._fn

    def __call__(self, *args, **kwargs):
        ep = knn_ops.session_epoch()
        if ep != self._epoch:
            # a FRESH closure per epoch: jax.jit keys its trace cache on
            # the underlying callable's identity, so re-jitting self._fn
            # directly would silently reuse the stale-routing traces
            fn = self._fn
            self._jit = jax.jit(lambda *a, **kw: fn(*a, **kw))
            self._epoch = ep
        return self._jit(*args, **kwargs)


class Model:
    """RandLA-Net model wrapper with weight saving, loading and prediction
    (reference model.py:21-336)."""

    def __init__(
        self,
        settings: RandLANetSettings,
        weights: Optional[Dict] = None,
        use_gpu: bool = True,
        seed: int = 0,
        transfer_dtype: str = "float32",
    ):
        """
        :param settings: Model settings defining RandLANet.
        :param weights: Optional flax variables {"params", "batch_stats"}
                        to initialize the model with.
        :param use_gpu: Kept for reference API parity; device placement is
                        JAX's (the default device — TPU when present).
        :param transfer_dtype: dtype for the host→device upload of full
            clouds in :meth:`predict` / :meth:`predict_mask`. "float16"
            halves the upload bytes (the dominant wall cost per live frame —
            benchmarks/RESULTS.md predict breakdown); coordinates are cast
            back to float32 on device before any compute, so the only
            effect is input quantization: f16 eps is 4.9e-4 relative
            (~0.3 mm at the L515's 0.6 m range cap), below the sensor's
            own 1-2 mm depth noise. Default keeps bit-exact reference
            parity.
        """
        from recognizer3d_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        assert transfer_dtype in ("float32", "float16"), transfer_dtype
        self._transfer_dtype = np.dtype(transfer_dtype)
        self.settings = settings
        self._module = RandLANet(settings)
        self._use_gpu = use_gpu
        if weights is not None:
            self._variables = jax.device_put(weights)
        else:
            # parameters are independent of N (every layer is channel-
            # shaped), so initialise at the smallest legal cloud — at the
            # large-scene configs an init at n_points would compile and run
            # a full million-point forward just to create the pytree
            n_init = settings.min_n_points
            dummy = jnp.zeros((1, n_init, 3 + settings.n_features), jnp.float32)
            perm = jnp.arange(n_init, dtype=jnp.int32)
            self._variables = self._module.init(
                jax.random.PRNGKey(seed), dummy, perm, train=False
            )

        # jitted programs ------------------------------------------------
        def _forward(variables, inputs, permutation):
            if inputs.shape[1] >= _LARGE_FORWARD_MIN:
                return forward_eval_large(
                    variables, settings, inputs, permutation
                )
            if (
                inputs.shape[0] > 1
                and inputs.shape[0] * inputs.shape[1] > _BATCHED_PER_CLOUD_MIN
            ):
                # Eval-mode BN reads running stats, so clouds are fully
                # independent: running the forward per cloud is numerically
                # identical and keeps every gather/KNN stage in the
                # single-cloud table-locality regime (batched row gathers
                # slow ~linearly with table size past ~128k rows —
                # benchmarks/RESULTS.md "Batched row gathers").
                return lax.map(
                    lambda xb: self._module.apply(
                        variables, xb[None], permutation, train=False
                    )[0],
                    inputs,
                )
            return self._module.apply(variables, inputs, permutation, train=False)

        def _forward_softmax(variables, inputs, permutation):
            logits = _forward(variables, inputs, permutation)
            return jax.nn.softmax(logits, axis=-2)

        def _upsample_conf(confidences, xyz, xyz_upsampled):
            # confidences (B, C, N1) -> (B, C, N2)
            feats = jnp.swapaxes(confidences, -1, -2)
            up = upsample_features(
                feats,
                xyz,
                xyz_upsampled,
                approach=settings.upsampling,
                knn_approach=settings.knn if settings.knn != "kdtree" else "naive",
            )
            return jnp.swapaxes(up, -1, -2)

        def _predict_full(variables, inputs_full, sample_idx, permutation):
            # ONE program for the whole predict: device-side consistent
            # subsample -> forward -> softmax -> full-cloud upsample. A single
            # dispatch + a single host->device transfer per frame (the live
            # 250 ms loop's budget, reference main.py:49). The upload may
            # arrive float16 (transfer_dtype) — all compute stays float32.
            inputs_full = inputs_full.astype(jnp.float32)
            sampled = jnp.take(inputs_full, sample_idx, axis=1)
            logits = self._module.apply(
                variables, sampled, permutation, train=False
            )
            confidences = jax.nn.softmax(logits, axis=-2)
            return _upsample_conf(
                confidences, sampled[..., :3], inputs_full[..., :3]
            )

        def _predict_mask(variables, inputs_full, sample_idx, permutation, thr):
            # the live-loop fast path: threshold the foreground confidence
            # ON DEVICE so the host downloads one bool per point (~8× less
            # than the (C, N) float confidences through the relay)
            conf = _predict_full(variables, inputs_full, sample_idx, permutation)
            return conf[:, 1, :] > thr

        self._forward_jit = _GuardedJit(_forward)
        self._forward_softmax_jit = _GuardedJit(_forward_softmax)
        self._upsample_jit = _GuardedJit(_upsample_conf)
        self._predict_full_fn = _predict_full  # un-jitted (benchmarks chain it)
        self._predict_full_jit = _GuardedJit(_predict_full)
        self._predict_mask_jit = _GuardedJit(_predict_mask)
        #: session-first-frame recall guard (VERDICT r4 #1) pending
        self._recall_guard_ran = False

    # ------------------------------------------------------------------
    # properties
    # ------------------------------------------------------------------

    @property
    def module(self) -> RandLANet:
        """Underlying flax Module (parity with model.py:71-74)."""
        return self._module

    @property
    def variables(self) -> Dict:
        """Current flax variables {"params", "batch_stats"}."""
        return self._variables

    @variables.setter
    def variables(self, new_vars: Dict) -> None:
        self._variables = new_vars

    def __str__(self) -> str:
        return self._module.tabulate(
            jax.random.PRNGKey(0),
            jnp.zeros(
                (1, max(self.settings.n_points, self.settings.min_n_points),
                 3 + self.settings.n_features),
                jnp.float32,
            ),
            jnp.arange(
                max(self.settings.n_points, self.settings.min_n_points),
                dtype=jnp.int32,
            ),
            depth=2,
        )

    # ------------------------------------------------------------------
    # serialization (archive layout parity: model.py:76-121)
    # ------------------------------------------------------------------

    @staticmethod
    def load(
        path: Path,
        use_gpu: bool = True,
        transfer_dtype: str = "float32",
        **kwargs,
    ) -> "Model":
        """Load a model archive — ours (msgpack) or the reference's (torch).

        kwargs override settings fields after load (model.py:100-104).
        """
        path = Path(path)
        assert path.is_file(), f"Could not find model file at {path}!"
        with tempfile.TemporaryDirectory() as tmp_str:
            tmp = Path(tmp_str)
            shutil.unpack_archive(str(path), tmp, format="zip")
            with (tmp / "config").open("r") as f:
                config = json.load(f)
            known = {k: v for k, v in config.items() if k in RandLANetSettings.__dataclass_fields__}
            settings = RandLANetSettings(**known)
            for key, value in kwargs.items():
                if hasattr(settings, key):
                    setattr(settings, key, value)
            blob = (tmp / "model").read_bytes()
        variables = Model._decode_weights(blob, settings)
        return Model(
            settings,
            weights=variables,
            use_gpu=use_gpu,
            transfer_dtype=transfer_dtype,
        )

    @staticmethod
    def _decode_weights(blob: bytes, settings: RandLANetSettings) -> Dict:
        try:
            restored = flax_serialization.msgpack_restore(blob)
            if "params" in restored:
                return restored
        except Exception:
            pass
        # fall back: a PyTorch reference archive
        import io

        import torch  # host-side deserialisation only

        from recognizer3d_tpu.models.torch_compat import (
            state_dict_to_numpy,
            torch_state_dict_to_variables,
        )

        state_dict = torch.load(io.BytesIO(blob), map_location="cpu")
        if "model" in state_dict.keys():
            state_dict = state_dict["model"]
        return torch_state_dict_to_variables(
            state_dict_to_numpy(state_dict), settings
        )

    def save(self, path: Path) -> None:
        """Save as a zip of ``config`` (JSON) + ``model`` (msgpack weights),
        mirroring the reference archive layout (model.py:107-121)."""
        path = Path(path)
        os.makedirs(path.parent, exist_ok=True)
        with tempfile.TemporaryDirectory() as tmp_str:
            tmp = Path(tmp_str)
            with (tmp / "config").open("w") as f:
                json.dump(asdict(self.settings), f)
            host_vars = jax.device_get(self._variables)
            (tmp / "model").write_bytes(flax_serialization.to_bytes(host_vars))
            with tempfile.TemporaryDirectory() as tmp2:
                shutil.make_archive(str(Path(tmp2) / "file"), "zip", tmp)
                shutil.move(str(Path(tmp2) / "file.zip"), path)

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def upsample(self, logits, xyz, xyz_upsampled) -> jax.Array:
        """softmax(logits) upsampled onto xyz_upsampled (model.py:123-142).
        logits (B, C, N1); returns confidences (B, C, N2).

        The target cloud is padded to a proportional bucket (``_bucket``)
        so repeated calls with varying cloud sizes reuse compiled programs."""
        confidences = jax.nn.softmax(jnp.asarray(logits), axis=-2)
        xyz_upsampled = np.asarray(xyz_upsampled, dtype=np.float32)
        n_full = xyz_upsampled.shape[-2]
        n_padded = _bucket(n_full)
        if n_padded != n_full:
            pad_width = [(0, 0)] * xyz_upsampled.ndim
            pad_width[-2] = (0, n_padded - n_full)
            xyz_upsampled = np.pad(xyz_upsampled, pad_width)
        out = self._upsample_jit(
            confidences, jnp.asarray(xyz), jnp.asarray(xyz_upsampled)
        )
        return out[..., :n_full]

    def _knn_regime_warnings(self) -> None:
        """Performance-guidance warnings (model.py:160-184), adapted to the
        on-device backends."""
        if self.settings.knn == "kdtree":
            logging.warning(
                'knn="kdtree" runs the native CPU KD-tree through a host '
                "callback INSIDE the jitted forward — 5 host round-trips "
                "per prediction (one per encoder/decoder KNN), each a relay "
                "RTT on remote-TPU setups. Use it as a correctness oracle; "
                'prefer knn="naive"/"pallas"/"approximate" for latency.'
            )
        if self.settings.n_points > 20000:
            if self.settings.knn == "naive":
                logging.warning(
                    'knn="naive" for N > 20000 materialises large distance '
                    'tiles; consider knn="pallas" or knn="approximate".'
                )
        elif self.settings.knn not in ("naive", "pallas", "kdtree"):
            logging.warning(
                "For improved performance, it is recommended to "
                'use knn="naive" when N < 20000.'
            )

    #: warn when the sampled approximate-KNN recall@k on the evaluation
    #: data drops below this (the shipped routing's measured envelope on
    #: the reference's real captures is 0.961-0.979 — RESULTS.md)
    KNN_RECALL_WARN_THRESHOLD = 0.9

    def _maybe_run_recall_guard(self, full_cloud: np.ndarray) -> None:
        """Session-first-frame recall guard (VERDICT r4 #1): when the
        reference-default ``knn="approximate"`` is in its Morton-window
        regime at this model's n_points, probe the first cloud's sampled
        self-KNN recall and let ``ops/knn.ensure_window_recall`` widen the
        session window (4096 → 8192 → 16384) or demote the session to the
        exact path — so out-of-distribution geometry cannot silently
        under-recall (the r4 gaussian worst case measured 0.877 at the
        tuned window). Runs ONCE per Model instance (the probe costs one
        window + 256-query exact search — amortised to ~zero over a live
        session); already-traced programs retrace via _GuardedJit when the
        guard acts. Opt out with RECOGNIZER3D_KNN_RECALL=0.

        :param full_cloud: (N, >=3) one representative host cloud; the
            probe samples it to n_points exactly like the forward will.
        """
        if self._recall_guard_ran or self.settings.knn != "approximate":
            return
        if os.environ.get("RECOGNIZER3D_KNN_RECALL", "") == "0":
            self._recall_guard_ran = True
            return
        if not knn_ops.window_regime_active(self.settings.n_points):
            self._recall_guard_ran = True
            return
        full_cloud = np.asarray(full_cloud, np.float32)
        if full_cloud.ndim != 2 or len(full_cloud) == 0:
            return
        self._recall_guard_ran = True
        idx = consistent_sample_indices(
            len(full_cloud), self.settings.n_points
        )
        knn_ops.ensure_window_recall(
            full_cloud[idx, :3], self.settings.n_neighbors
        )

    def _check_knn_recall(self, dataset) -> None:
        """Opt-out sampled recall check on the first evaluation cloud when
        ``knn="approximate"`` (VERDICT r3 #6): a routing regression in the
        window search would otherwise surface only as silent accuracy
        loss. In the Morton-window regime this runs the ACTING guard
        (``_maybe_run_recall_guard`` — widen-or-fallback, VERDICT r4 #1);
        below it (where "approximate" is full-distance approx_min_k /
        exact argmin and there is no window to widen) it keeps the r3
        warn-only probe. Disable with RECOGNIZER3D_KNN_RECALL=0. Cost: one
        extra approximate + 256-query exact search at n_points per
        ``evaluate`` call (once per Model in the guard regime)."""
        if self.settings.knn != "approximate":
            return
        if os.environ.get("RECOGNIZER3D_KNN_RECALL", "") == "0":
            return
        try:
            # the cloud row is (N, 3+F) when n_features > 0 — the model's
            # KNN searches xyz only, so the probe must too (a probe over
            # feature columns would mis-measure the Morton-window routing,
            # which assumes 3-D coordinates)
            xyz = np.asarray(dataset[0][0], np.float32)[:, :3]
        except Exception:  # empty dataset / exotic sequence: nothing to check
            return
        n = self.settings.n_points
        if len(xyz) == 0:
            return
        if knn_ops.window_regime_active(n):
            self._maybe_run_recall_guard(xyz)
            return
        idx = consistent_sample_indices(len(xyz), n)
        cloud = jnp.asarray(xyz[idx][None])
        from recognizer3d_tpu.ops.knn import measure_recall

        recall = measure_recall(
            cloud, cloud, self.settings.n_neighbors, "approximate"
        )
        if recall < self.KNN_RECALL_WARN_THRESHOLD:
            logging.warning(
                "approximate-KNN sampled recall@%d on the evaluation data "
                "is %.3f (< %.2f) — the Morton-window routing may be "
                "mismatched to this distribution; consider knn=\"naive\" "
                "or \"pallas\" for this evaluation.",
                self.settings.n_neighbors, recall,
                self.KNN_RECALL_WARN_THRESHOLD,
            )

    def _prepare_full(self, inputs: np.ndarray):
        """Host prep shared by the full-cloud predict paths: cached
        consistent-sample indices, the per-call random permutation
        (reference modules.py:568-573 — a fresh draw per forward, under
        the caller's numpy seed like the 10-seed eval protocol expects),
        and bucket padding into a REUSED pinned buffer so live frames of
        varying size share one compiled program without a fresh
        allocation+copy each frame."""
        n_full = inputs.shape[1]
        indices = np.asarray(
            consistent_sample_indices(n_full, self.settings.n_points),
            dtype=np.int32,
        )
        permutation = np.random.permutation(self.settings.n_points).astype(
            np.int32
        )
        n_padded = _bucket(n_full)
        dtype = self._transfer_dtype
        if n_padded == n_full:
            return (
                inputs.astype(dtype, copy=False), indices, permutation, n_full
            )
        buf_key = (inputs.shape[0], n_padded, inputs.shape[2])
        buf = getattr(self, "_pad_buffer", None)
        if buf is None or buf.shape != buf_key or buf.dtype != dtype:
            buf = np.zeros(buf_key, dtype)
            self._pad_buffer = buf
        buf[:, :n_full] = inputs  # casts to the transfer dtype on copy
        buf[:, n_full:] = 0.0
        return buf, indices, permutation, n_full

    def predict_mask(
        self,
        xyz: np.ndarray,
        threshold: float = 0.5,
        features: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Boolean foreground mask for one full cloud — the live-loop fast
        path: same computation as :meth:`predict` (consistent subsample →
        forward → softmax → full-cloud upsample) but thresholded on device
        so only one bool per point crosses back to the host.

        :param xyz: (N, 3) or (B, N, 3) coordinates.
        :return: (N,) or (B, N) bool, class-1 confidence > threshold.
        """
        assert xyz.shape[-1] == 3, "xyz should have shape (B) x N x 3!"
        batched = xyz.ndim == 3
        inputs = xyz if batched else np.expand_dims(xyz, 0)
        if features is not None:
            feats = features if features.ndim == 3 else features[None]
            inputs = np.concatenate((inputs, feats), axis=-1)
        inputs = inputs.astype(np.float32)
        self._maybe_run_recall_guard(inputs[0])
        inputs_padded, indices, permutation, n_full = self._prepare_full(
            inputs
        )
        mask = np.asarray(
            self._predict_mask_jit(
                self._variables,
                inputs_padded,
                indices,
                permutation,
                np.float32(threshold),
            )
        )[:, :n_full]
        return mask if batched else mask[0]

    def predict(
        self,
        xyz: np.ndarray,
        features: Optional[np.ndarray] = None,
        prepostprocess: bool = True,
    ) -> np.ndarray:
        """Predict per-class confidences on one or a batch of point clouds
        (model.py:146-235).

        :param xyz: Point coordinates (B, N, 3) or (N, 3).
        :param features: Optional point features (B, N, F) or (N, F).
        :param prepostprocess: Include the consistent subsample to
            ``settings.n_points`` and the upsample back onto the full cloud.
        :return: Per-class confidences (B, C, N) or (C, N) as numpy.
        """
        self._knn_regime_warnings()
        assert xyz.shape[-1] == 3, "xyz should have shape (B) x N x 3!"
        batched = True
        if len(xyz.shape) == 2:
            xyz = np.expand_dims(xyz, 0)
            batched = False
        if features is not None and len(features.shape) == 2:
            features = np.expand_dims(features, 0)
        inputs = xyz
        if features is not None:
            assert xyz.shape[0] == features.shape[0], (
                "xyz and features should have same batch size!"
            )
            assert xyz.shape[1] == features.shape[1], (
                "xyz and features should have same number of points!"
            )
            inputs = np.concatenate((xyz, features), axis=-1)
        inputs = inputs.astype(np.float32)
        self._maybe_run_recall_guard(inputs[0])

        if self.settings.upsampling == "none":
            prepostprocess = False

        if prepostprocess:
            inputs_padded, indices, permutation, n_full = self._prepare_full(
                inputs
            )
            predictions = self._predict_full_jit(
                self._variables,
                inputs_padded,
                indices,
                permutation,
            )
            predictions = np.asarray(predictions)[:, :, :n_full]
        else:
            permutation = np.random.permutation(inputs.shape[1]).astype(np.int32)
            predictions = np.asarray(
                self._forward_softmax_jit(self._variables, inputs, permutation)
            )
        if not batched:
            predictions = predictions[0]
        return predictions

    # ------------------------------------------------------------------
    # training / evaluation
    # ------------------------------------------------------------------

    def train(
        self,
        dataset_train: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
        dataset_validation: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
        training_settings=None,
        augmentation_settings: AugmentationSettings = AugmentationSettings(),
        log_dir: Optional[Path] = None,
        class_names: Optional[List[str]] = None,
        callbacks: List[Callable[[int, Dict[str, float]], None]] = [],
    ):
        """Train this model in place (model.py:237-299)."""
        from recognizer3d_tpu.training.settings import TrainingSettings
        from recognizer3d_tpu.training.trainer import Trainer

        if training_settings is None:
            training_settings = TrainingSettings()
        assert (
            class_names is not None
            and len(class_names) == self.settings.n_classes
        ), (
            "The length of given class names should correspond to the "
            "n_classes setting of the model"
        )
        try:
            # run the recall guard BEFORE the trainer traces its programs:
            # the trainer's jitted step reads the (possibly widened)
            # session routing at trace time
            self._maybe_run_recall_guard(
                np.asarray(dataset_train[0][0], np.float32)
            )
        except Exception:
            pass
        train_dataloader = get_data_loader(
            dataset_train,
            self.settings.n_points,
            training_settings.batch_size,
            shuffle=True,
            consistent_sampling=False,
            augmentation_settings=augmentation_settings,
        )
        validation_dataloader = get_data_loader(
            dataset_validation,
            self.settings.n_points,
            training_settings.batch_size,
            shuffle=False,
            consistent_sampling=True,
        )
        trainer = Trainer(
            train_dataloader, validation_dataloader, log_dir, class_names
        )
        trainer.train(self, training_settings, callbacks=callbacks)

    def evaluate(
        self,
        dataset: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
        class_names: Optional[List[str]] = None,
        batch_size: int = 16,
        loss_function: str = "dice",
        postprocess: bool = False,
        include_stdev: bool = False,
    ) -> Dict:
        """Run the 10-seed evaluation protocol (model.py:301-336)."""
        from recognizer3d_tpu.training.trainer import Trainer

        self._check_knn_recall(dataset)
        dataloader = get_data_loader(
            dataset,
            self.settings.n_points,
            batch_size,
            shuffle=False,
            consistent_sampling=True,
        )
        bag = Trainer.evaluate(
            self, dataloader, class_names, loss_function, postprocess
        )
        return bag.as_dict(include_stdev=include_stdev)
