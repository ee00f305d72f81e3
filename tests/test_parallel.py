"""Multi-device tests on the 8-virtual-CPU mesh: data-parallel training step,
ring KNN (point sharding), and batch-sharding helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from recognizer3d_tpu.ops.knn import knn_naive
from recognizer3d_tpu.parallel.mesh import (
    data_parallel_mesh,
    replicate_fn,
    shard_batch_fn,
)
from recognizer3d_tpu.parallel.ring_knn import (
    point_sharded_mesh,
    ring_knn,
    ring_knn_gather,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestRingKnn:
    def test_matches_single_device(self, eight_devices):
        mesh = point_sharded_mesh(8)
        rng = np.random.RandomState(0)
        support = jnp.asarray(rng.rand(2, 64 * 8, 3).astype(np.float32))
        query = jnp.asarray(rng.rand(2, 32 * 8, 3).astype(np.float32))
        idx, d2 = ring_knn(support, query, 8, mesh)
        ref_idx, ref_d2 = knn_naive(support, query, 8)
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(ref_d2), atol=1e-5
        )
        # indices must reproduce the distances
        s = np.asarray(support)
        q = np.asarray(query)
        got_i = np.asarray(idx)
        for b in range(2):
            pts = s[b][got_i[b]]
            d2_check = np.sum((pts - q[b][:, None, :]) ** 2, axis=-1)
            np.testing.assert_allclose(
                d2_check, np.asarray(d2)[b], atol=1e-5
            )

    def test_ring_knn_gather_matches_oracle(self, eight_devices):
        mesh = point_sharded_mesh(8)
        rng = np.random.RandomState(1)
        support = jnp.asarray(rng.rand(1, 48 * 8, 3).astype(np.float32))
        query = jnp.asarray(rng.rand(1, 16 * 8, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 48 * 8, 5).astype(np.float32))
        idx, d2, nf = ring_knn_gather(support, query, feats, 6, mesh)
        ref_idx, ref_d2 = knn_naive(support, query, 6)
        np.testing.assert_allclose(
            np.asarray(d2), np.asarray(ref_d2), atol=1e-5
        )
        # gathered features must equal features[idx] (the whole point:
        # the ring pass delivers every neighbour's features shard-locally)
        f = np.asarray(feats)[0]
        got_i = np.asarray(idx)[0]
        np.testing.assert_allclose(
            np.asarray(nf)[0], f[got_i], atol=1e-6
        )

    def test_ring_gather_matches_local(self, eight_devices):
        from recognizer3d_tpu.parallel.ring_knn import ring_gather

        mesh = point_sharded_mesh(8)
        rng = np.random.RandomState(2)
        feats = jnp.asarray(rng.randn(1, 40 * 8, 3).astype(np.float32))
        idx = jnp.asarray(
            rng.randint(0, 40 * 8, (1, 24 * 8, 5)).astype(np.int32)
        )
        out = ring_gather(feats, idx, mesh)
        ref = np.asarray(feats)[0][np.asarray(idx)[0]]
        np.testing.assert_allclose(np.asarray(out)[0], ref, atol=1e-6)

    def test_sp_lfa_matches_single_device(self, eight_devices):
        from recognizer3d_tpu.models.randlanet import LocalFeatureAggregation
        from recognizer3d_tpu.parallel.sp_lfa import sp_lfa_eval

        mesh = point_sharded_mesh(8)
        rng = np.random.RandomState(3)
        n = 32 * 8
        xyz = jnp.asarray(rng.rand(1, n, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, n, 8).astype(np.float32))
        lfa = LocalFeatureAggregation(16, 8, "naive")
        variables = lfa.init(jax.random.PRNGKey(0), xyz, feats)
        ref = lfa.apply(variables, xyz, feats, train=False)
        got = sp_lfa_eval(variables, xyz, feats, 8, mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_self_knn_sharded(self, eight_devices):
        mesh = point_sharded_mesh(8)
        rng = np.random.RandomState(1)
        cloud = jnp.asarray(rng.rand(1, 16 * 8, 3).astype(np.float32))
        idx, d2 = ring_knn(cloud, cloud, 4, mesh)
        np.testing.assert_array_equal(
            np.asarray(idx)[0, :, 0], np.arange(128)
        )
        np.testing.assert_allclose(np.asarray(d2)[0, :, 0], 0.0, atol=1e-7)

    def test_k_larger_than_local_shard(self, eight_devices):
        # k > N/D: each step contributes fewer than k candidates
        mesh = point_sharded_mesh(8)
        rng = np.random.RandomState(2)
        support = jnp.asarray(rng.rand(1, 8 * 8, 3).astype(np.float32))
        query = jnp.asarray(rng.rand(1, 8 * 8, 3).astype(np.float32))
        idx, d2 = ring_knn(support, query, 16, mesh)  # 16 > 64/8
        _, ref = knn_naive(support, query, 16)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(ref), atol=1e-5)


class TestDataParallel:
    def test_shard_and_replicate(self, eight_devices):
        mesh = data_parallel_mesh(8)
        shard = shard_batch_fn(mesh)
        x = shard(np.arange(8 * 4, dtype=np.float32).reshape(8, 4))
        assert len(x.sharding.device_set) == 8
        rep = replicate_fn(mesh)({"w": np.ones(3, np.float32)})
        assert len(rep["w"].sharding.device_set) == 8

    def test_dp_train_step_runs(self, eight_devices):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)

    def test_dp_gradients_match_single_device(self, eight_devices):
        """The sharded loss/grad equals the unsharded one (same batch)."""
        mesh = data_parallel_mesh(8)
        shard = shard_batch_fn(mesh)

        def loss_fn(w, x):
            return jnp.mean((x @ w) ** 2)

        rng = np.random.RandomState(0)
        x = rng.randn(8, 5).astype(np.float32)
        w = rng.randn(5).astype(np.float32)
        g_ref = jax.grad(loss_fn)(jnp.asarray(w), jnp.asarray(x))
        g_dp = jax.jit(jax.grad(loss_fn))(jnp.asarray(w), shard(x))
        np.testing.assert_allclose(
            np.asarray(g_dp), np.asarray(g_ref), rtol=1e-5
        )


class TestPointShardedModel:
    """Full RandLA-Net forward + train step over a point-sharded mesh must
    match the single-device module weight-for-weight."""

    def _setup(self):
        from recognizer3d_tpu.models.randlanet import RandLANet
        from recognizer3d_tpu.models.settings import RandLANetSettings
        from recognizer3d_tpu.parallel.sp_model import (
            SPBackend,
            point_sharded_model,
        )

        settings = RandLANetSettings(
            n_classes=2,
            n_points=256,
            n_features=0,
            n_neighbors=4,
            decimation=2,
            layer_sizes=[4, 8, 16, 32],
            knn="naive",
        )
        mesh = point_sharded_mesh(8)
        single = RandLANet(settings)
        sharded = point_sharded_model(settings, mesh)
        rng = np.random.RandomState(0)
        inputs = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
        perm = jnp.asarray(rng.permutation(256).astype(np.int32))
        variables = single.init(jax.random.PRNGKey(0), inputs, perm)
        backend = SPBackend(mesh)
        return single, sharded, backend, variables, inputs, perm

    def test_forward_parity(self, eight_devices):
        single, sharded, backend, variables, inputs, perm = self._setup()
        ref = single.apply(variables, inputs, perm, train=False)
        sp_in = backend.shard_inputs(inputs)
        got = jax.jit(
            lambda v, x, p: sharded.apply(v, x, p, train=False)
        )(variables, sp_in, perm)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3
        )

    def test_train_step_parity(self, eight_devices):
        """Loss, gradients AND the cross-shard BatchNorm batch statistics
        of one training step must match the single-device step."""
        from recognizer3d_tpu.training.losses import get_loss

        single, sharded, backend, variables, inputs, perm = self._setup()
        rng = np.random.RandomState(1)
        labels = jnp.asarray(rng.randint(0, 2, (2, 256)).astype(np.int32))
        criterion = get_loss("dice")
        dropout_key = jax.random.PRNGKey(7)

        def step(module, variables, x):
            def loss_fn(params):
                logits, updates = module.apply(
                    {
                        "params": params,
                        "batch_stats": variables["batch_stats"],
                    },
                    x,
                    perm,
                    train=True,
                    rngs={"dropout": dropout_key},
                    mutable=["batch_stats"],
                )
                return criterion(logits, labels), updates["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(variables["params"])
            return loss, stats, grads

        loss_ref, stats_ref, grads_ref = step(single, variables, inputs)
        loss_sp, stats_sp, grads_sp = jax.jit(
            lambda v, x: step(sharded, v, x)
        )(variables, backend.shard_inputs(inputs))

        np.testing.assert_allclose(
            float(loss_sp), float(loss_ref), atol=1e-5, rtol=1e-4
        )
        for ref_leaf, sp_leaf in zip(
            jax.tree.leaves(stats_ref), jax.tree.leaves(stats_sp)
        ):
            np.testing.assert_allclose(
                np.asarray(sp_leaf), np.asarray(ref_leaf),
                atol=1e-4, rtol=1e-3,
            )
        for ref_leaf, sp_leaf in zip(
            jax.tree.leaves(grads_ref), jax.tree.leaves(grads_sp)
        ):
            np.testing.assert_allclose(
                np.asarray(sp_leaf), np.asarray(ref_leaf),
                atol=5e-4, rtol=5e-3,
            )

    def test_dp_sp_2d_mesh_forward_parity(self, eight_devices):
        """DP×SP: batch sharded 2-way AND points 4-way on one 2-D mesh."""
        from jax.sharding import Mesh

        from recognizer3d_tpu.models.randlanet import RandLANet
        from recognizer3d_tpu.models.settings import RandLANetSettings
        from recognizer3d_tpu.parallel.sp_model import (
            SPBackend,
            point_sharded_model,
        )

        settings = RandLANetSettings(
            n_classes=2,
            n_points=128,
            n_features=0,
            n_neighbors=4,
            decimation=2,
            layer_sizes=[4, 8, 16, 32],
            knn="naive",
        )
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, axis_names=("batch", "points"))
        single = RandLANet(settings)
        sharded = point_sharded_model(settings, mesh, batch_axis="batch")
        backend = SPBackend(mesh, batch_axis="batch")
        rng = np.random.RandomState(3)
        inputs = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
        perm = jnp.asarray(rng.permutation(128).astype(np.int32))
        variables = single.init(jax.random.PRNGKey(0), inputs, perm)
        ref = single.apply(variables, inputs, perm, train=False)
        got = jax.jit(
            lambda v, x, p: sharded.apply(v, x, p, train=False)
        )(variables, backend.shard_inputs(inputs), perm)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3
        )

    def test_pad_for_sharding_granule(self, eight_devices):
        """VERDICT r2 #3: arbitrary cloud sizes become SP-runnable via
        duplicate-point padding to the sharding granule."""
        from recognizer3d_tpu.models.settings import RandLANetSettings
        from recognizer3d_tpu.parallel.sp_model import (
            pad_for_sharding,
            sharding_multiple,
        )

        s = RandLANetSettings(
            n_classes=2, n_points=256, n_neighbors=4, decimation=2,
            layer_sizes=[4, 8, 16, 32], knn="naive",
        )
        assert sharding_multiple(s, 8) == 128  # 2^4 levels × 8 shards
        cloud = np.random.RandomState(0).rand(300, 3).astype(np.float32)
        padded, n = pad_for_sharding(cloud, s, 8)
        assert n == 300 and padded.shape == (384, 3)
        # every padding row is a duplicate of a real point
        d2 = ((padded[300:, None] - cloud[None]) ** 2).sum(-1)
        assert d2.min(axis=1).max() == 0.0
        # already-aligned clouds pass through untouched
        same, n2 = pad_for_sharding(padded, s, 8)
        assert same is padded and n2 == 384

    def test_sp_serving_padded_matches_single_device(self, eight_devices):
        """SPServing on a NON-divisible cloud must equal the single-device
        full-resolution forward of the same padded cloud (weight-for-weight,
        same pad + permutation draws)."""
        from recognizer3d_tpu import Model
        from recognizer3d_tpu.models.facade import _bucket
        from recognizer3d_tpu.models.settings import RandLANetSettings
        from recognizer3d_tpu.parallel.serving import SPServing
        from recognizer3d_tpu.parallel.sp_model import pad_for_sharding

        s = RandLANetSettings(
            n_classes=2, n_points=256, n_neighbors=4, decimation=2,
            layer_sizes=[4, 8, 16, 32], knn="naive",
        )
        model = Model(s, seed=0)
        cloud = np.random.RandomState(1).rand(300, 3).astype(np.float32)
        conf_sp = SPServing(model, 8).predict(cloud)
        assert conf_sp.shape == (2, 300)
        # replay SPServing's host draws (RandomState(0): pad dup indices,
        # then the permutation) on the single-device module
        rng = np.random.RandomState(0)
        padded, n = pad_for_sharding(
            cloud, s, 8, n_target=_bucket(300), rng=rng
        )
        perm = jnp.asarray(rng.permutation(padded.shape[0]).astype(np.int32))
        logits = model.module.apply(
            model.variables, jnp.asarray(padded[None]), perm, train=False
        )
        ref = np.asarray(jax.nn.softmax(logits, axis=-2))[0, :, :300]
        np.testing.assert_allclose(conf_sp, ref, atol=5e-4, rtol=1e-3)

    def test_rejects_indivisible_levels(self, eight_devices):
        from recognizer3d_tpu.models.settings import RandLANetSettings
        from recognizer3d_tpu.parallel.sp_model import point_sharded_model

        settings = RandLANetSettings(
            n_classes=2,
            n_points=80,  # level 80/2=40/2=20/2=10 -> not divisible by 8
            n_neighbors=4,
            decimation=2,
            layer_sizes=[4, 8, 16, 32],
            knn="naive",
        )
        mesh = point_sharded_mesh(8)
        module = point_sharded_model(settings, mesh)
        rng = np.random.RandomState(0)
        inputs = jnp.asarray(rng.rand(1, 80, 3).astype(np.float32))
        perm = jnp.asarray(rng.permutation(80).astype(np.int32))
        with pytest.raises(ValueError, match="divisible"):
            module.init(jax.random.PRNGKey(0), inputs, perm)


class TestDataParallelEpochFusion:
    """The fused epoch scan under a data-parallel mesh must reproduce the
    single-device scan (same seeds -> same batches/permutations/dropout;
    GSPMD only changes where the arithmetic runs)."""

    def _train_losses(self, tmp_path, n_devices):
        from datetime import datetime

        from recognizer3d_tpu import (
            AugmentationSettings,
            Dataset,
            Model,
            RandLANetSettings,
            TrainingSettings,
        )

        # 3 clouds -> split(0.8) = 2 train / 1 val: with batch_size=2 the
        # epoch is exactly ONE update step, so param differences can come
        # only from reduction reassociation (+ Adam sign-flips where g~0),
        # not from a chaotic multi-step cascade
        ds = Dataset(tmp_path / f"ds{n_devices}")
        rng = np.random.RandomState(0)
        for i in range(3):
            ts = datetime(2026, 1, 1, 11, 0, i)
            cloud = rng.randn(150 + 17 * i, 3).astype(np.float32) * 0.1
            ds[ts] = cloud
            ann = np.zeros(cloud.shape[0], dtype=np.uint8)
            ann[rng.choice(cloud.shape[0], 5, replace=False)] = 1
            ds.set_annotation(ts, ann)
        train_ds, val_ds = ds.split()

        tiny = dict(
            n_classes=2, n_points=64, n_neighbors=4, decimation=2,
            layer_sizes=[4, 8, 16, 32], knn="naive",
        )
        model = Model(RandLANetSettings(**tiny), seed=0)
        seen = []
        np.random.seed(123)  # pins pipe_root/dropout_root across runs
        model.train(
            train_ds,
            val_ds,
            TrainingSettings(
                epochs=1, batch_size=2, early_stopping=False,
                device_pipeline=True, data_parallel_devices=n_devices,
            ),
            AugmentationSettings(),
            class_names=["bg", "fg"],
            callbacks=[lambda e, m: seen.append(m)],
        )
        return seen, model.variables["params"]

    def test_ragged_batch_size_still_trains(self, eight_devices, tmp_path):
        """batch_size not divisible by data_parallel_devices must clamp the
        mesh (gcd), NOT drop every batch: regression for the bug where the
        ragged-batch guard discarded the whole epoch (zero optimizer steps,
        NaN loss) whenever batch_size % mesh.size != 0."""
        from datetime import datetime

        from recognizer3d_tpu import (
            Dataset, Model, RandLANetSettings, TrainingSettings,
        )

        ds = Dataset(tmp_path / "ragged")
        rng = np.random.RandomState(0)
        for i in range(4):
            ts = datetime(2026, 1, 1, 12, 0, i)
            cloud = rng.randn(150, 3).astype(np.float32) * 0.1
            ds[ts] = cloud
            ann = np.zeros(150, dtype=np.uint8)
            ann[rng.choice(150, 5, replace=False)] = 1
            ds.set_annotation(ts, ann)
        train_ds, val_ds = ds.split()

        tiny = dict(
            n_classes=2, n_points=64, n_neighbors=4, decimation=2,
            layer_sizes=[4, 8, 16, 32], knn="naive",
        )
        model = Model(RandLANetSettings(**tiny), seed=0)
        init_params = jax.tree.map(np.asarray, model.variables["params"])
        seen = []
        model.train(
            train_ds,
            val_ds,
            # gcd(3, 2) = 1 -> unsharded fallback; before the fix the
            # 2-device mesh dropped the (ragged) batch of 3 every epoch
            TrainingSettings(
                epochs=1, batch_size=3, early_stopping=False,
                device_pipeline=True, data_parallel_devices=2,
            ),
            class_names=["bg", "fg"],
            callbacks=[lambda e, m: seen.append(m)],
        )
        assert len(seen) == 1
        assert np.isfinite(seen[0]["loss"])
        moved = any(
            not np.allclose(a, np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(init_params),
                jax.tree.leaves(model.variables["params"]),
            )
        )
        assert moved, "no optimizer step ran"

    def test_dp_epoch_scan_matches_single_device(self, eight_devices, tmp_path):
        """Same seeds -> same batches/permutations/dropout, so the sharded
        scan must track the single-device one: identical step losses (drawn
        pre-update) and near-identical trained parameters (GSPMD only
        reassociates the reductions; discrete metrics like val_mIoU are NOT
        compared — on a 64-point val cloud a 1e-6 logit shift flips argmax
        points)."""
        (single_m, single_p) = self._train_losses(tmp_path, 1)
        (dp_m, dp_p) = self._train_losses(tmp_path, 2)
        assert len(single_m) == len(dp_m) == 1
        # identical pre-update params + identical batch -> identical loss
        np.testing.assert_allclose(
            dp_m[0]["loss"], single_m[0]["loss"], rtol=1e-5, atol=1e-6
        )
        # params after the single Adam step: the bias-corrected first
        # update is lr*sign(g) per element, so where g ~ 0 a reassociation-
        # level perturbation flips the sign and moves that element by up to
        # 2*lr — nearly all elements must agree tightly, none beyond the
        # sign-flip envelope, and flips must be rare
        diffs = np.concatenate([
            np.abs(np.asarray(d) - np.asarray(s)).ravel()
            for s, d in zip(jax.tree.leaves(single_p), jax.tree.leaves(dp_p))
        ])
        lr = 1e-2
        assert np.quantile(diffs, 0.95) < 1e-4, np.quantile(diffs, 0.95)
        assert diffs.max() < 2 * lr * 1.05, diffs.max()
        assert (diffs > 1e-3).mean() < 0.02, (diffs > 1e-3).mean()


class TestMultiHost:
    def test_dryrun_multihost_two_processes(self):
        """SURVEY §5.8's multi-host (DCN) claim, executed: 2 OS processes ×
        2 virtual CPU devices form one jax.distributed mesh and run a DP
        train step whose gradient psum crosses the process boundary. The
        impl asserts finite + cross-process-identical losses and raises on
        any failure."""
        import __graft_entry__ as graft

        graft.dryrun_multihost(n_processes=2, devices_per_process=2)
