"""Data-parallel batch serving: shard the frame batch over a device mesh.

Eval-mode inference is embarrassingly parallel across frames (BatchNorm
reads running statistics — reference modules.py:87 semantics), so serving
scales by placing B/n clouds on each of n chips and running the SAME fused
predict program per shard; no collectives cross the wire. ``shard_map``
(not GSPMD auto-sharding) keeps the facade's per-cloud ``lax.map``
streaming (models/facade.py, big-cloud regime) LOCAL to each device's
shard — under auto-sharding that loop would serialise over the *global*
batch with one device active at a time.

The reference has no serving path at all (single-frame predict only,
model.py:146-235); this is the scale-out layer behind ``serve.py
--devices N``.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map

    _NO_CHECK = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

    _NO_CHECK = {"check_rep": False}  # pre-0.8 name of the same knob

from recognizer3d_tpu.parallel.mesh import data_parallel_mesh


class DPServing:
    """Batch ``predict`` / ``predict_mask`` over a data-parallel mesh.

    Mirrors :meth:`Model.predict` / :meth:`Model.predict_mask` — same host
    prep (cached consistent-sample indices, per-call permutation draw,
    bucket padding) and the same fused device program per shard — with the
    batch axis sharded over the mesh. Batches that don't divide the mesh
    are padded by repeating the last cloud; padding rows are dropped from
    the output.

    Weights are replicated onto the mesh once at construction; a model
    whose ``variables`` change afterwards needs a fresh ``DPServing``.
    """

    def __init__(self, model, n_devices: int = -1):
        self._model = model
        self.mesh = data_parallel_mesh(n_devices)
        self._variables = jax.device_put(
            model.variables, NamedSharding(self.mesh, P())
        )

        def _mask_local(variables, inputs, sample_idx, permutation, thr):
            conf = model._predict_full_fn(
                variables, inputs, sample_idx, permutation
            )
            return conf[:, 1, :] > thr

        batch_spec = P("data", None, None)
        self._mask_sharded = jax.jit(
            shard_map(
                _mask_local,
                mesh=self.mesh,
                in_specs=(P(), batch_spec, P(), P(), P()),
                out_specs=P("data", None),
                **_NO_CHECK,
            )
        )
        self._full_sharded = jax.jit(
            shard_map(
                model._predict_full_fn,
                mesh=self.mesh,
                in_specs=(P(), batch_spec, P(), P()),
                out_specs=P("data", None, None),
                **_NO_CHECK,
            )
        )

    @property
    def n_devices(self) -> int:
        return int(self.mesh.devices.size)

    def _prepare(self, xyz: np.ndarray):
        inputs = np.asarray(xyz, dtype=np.float32)
        assert inputs.ndim == 3 and inputs.shape[-1] == 3, (
            "DPServing expects a batch (B, N, 3) of clouds"
        )
        b = inputs.shape[0]
        pad_b = (-b) % self.n_devices
        if pad_b:
            inputs = np.concatenate(
                (inputs, np.repeat(inputs[-1:], pad_b, axis=0)), axis=0
            )
        padded, sample_idx, permutation, n_full = self._model._prepare_full(
            inputs
        )
        sharded = jax.device_put(
            padded, NamedSharding(self.mesh, P("data", None, None))
        )
        return sharded, sample_idx, permutation, n_full, b

    def predict_mask(
        self, xyz: np.ndarray, threshold: float = 0.5
    ) -> np.ndarray:
        """(B, N) bool foreground masks, class-1 confidence > threshold."""
        sharded, sample_idx, permutation, n_full, b = self._prepare(xyz)
        out = self._mask_sharded(
            self._variables, sharded, sample_idx, permutation,
            np.float32(threshold),
        )
        return np.asarray(out)[:b, :n_full]

    def predict(self, xyz: np.ndarray) -> np.ndarray:
        """(B, C, N) per-class confidences."""
        sharded, sample_idx, permutation, n_full, b = self._prepare(xyz)
        out = self._full_sharded(
            self._variables, sharded, sample_idx, permutation
        )
        return np.asarray(out)[:b, :, :n_full]


class SPServing:
    """Full-resolution POINT-SHARDED serving of huge clouds.

    :class:`DPServing` scales frames/sec; this scales POINTS per cloud:
    each cloud's N axis is block-sharded over the mesh ring
    (parallel/sp_model — ring-exchange KNN per LFA, GSPMD-resharded
    decimation, ring 1-NN decoder), so clouds beyond one chip's comfort run
    at FULL resolution — every point classified by the network directly, no
    subsample→forward→upsample approximation (``Model.predict``'s
    prepostprocess path). Behind ``serve.py --point-shards N``.

    Clouds are padded with duplicate points (``pad_for_sharding``) to a
    proportional-bucket multiple of the sharding granule; padded rows are
    dropped from the output. Weights are replicated onto the mesh once at
    construction.
    """

    def __init__(self, model, n_shards: int = -1):
        import jax.numpy as jnp

        from recognizer3d_tpu.parallel.ring_knn import point_sharded_mesh
        from recognizer3d_tpu.parallel.sp_model import (
            SPBackend,
            point_sharded_model,
        )

        self._jnp = jnp
        self._model = model
        self.mesh = point_sharded_mesh(n_shards)
        self._backend = SPBackend(self.mesh)
        module = point_sharded_model(model.settings, self.mesh)
        self._variables = jax.device_put(
            model.variables, NamedSharding(self.mesh, P())
        )

        def _conf(variables, inputs, permutation):
            logits = module.apply(variables, inputs, permutation, train=False)
            return jax.nn.softmax(logits, axis=-2)

        self._conf_jit = jax.jit(_conf)
        self._rng = np.random.RandomState(0)

    @property
    def n_shards(self) -> int:
        return int(self.mesh.devices.size)

    def _predict_one(self, cloud: np.ndarray) -> np.ndarray:
        from recognizer3d_tpu.models.facade import _bucket
        from recognizer3d_tpu.parallel.sp_model import pad_for_sharding

        padded, n = pad_for_sharding(
            cloud,
            self._model.settings,
            self.n_shards,
            # proportional bucket so varying capture sizes reuse programs
            n_target=_bucket(cloud.shape[0]),
            rng=self._rng,
        )
        permutation = self._rng.permutation(padded.shape[0]).astype(np.int32)
        x = self._backend.shard_inputs(self._jnp.asarray(padded[None]))
        conf = self._conf_jit(self._variables, x, self._jnp.asarray(permutation))
        return np.asarray(conf)[0, :, :n]

    def predict(self, xyz: np.ndarray) -> np.ndarray:
        """(C, N) or (B, C, N) full-resolution per-class confidences."""
        xyz = np.asarray(xyz, dtype=np.float32)
        if xyz.ndim == 2:
            return self._predict_one(xyz)
        return np.stack([self._predict_one(c) for c in xyz])

    def predict_mask(
        self, xyz: np.ndarray, threshold: float = 0.5
    ) -> np.ndarray:
        """(N,) or (B, N) bool: class-1 confidence above the threshold."""
        conf = self.predict(xyz)
        return conf[..., 1, :] > threshold
