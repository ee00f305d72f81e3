"""Device-resident pipeline, profiling utils and checkpoint/resume."""

from datetime import datetime

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recognizer3d_tpu import (
    AugmentationSettings,
    Dataset,
    Model,
    RandLANetSettings,
    TrainingSettings,
)
from recognizer3d_tpu.data.pipeline import (
    DeviceDatasetCache,
    normalize_cloud_device,
    z_filter_subsample,
)
from recognizer3d_tpu.training import checkpoint as ckpt
from recognizer3d_tpu.utils.profiling import timeit, timeit_amortized, warmup


class TestZFilterSubsample:
    def test_filters_and_fixes_size(self):
        rng = np.random.RandomState(0)
        raw = rng.rand(5000, 3).astype(np.float32)
        raw[:, 2] = rng.uniform(0.0, 1.0, 5000)  # some outside (0.05, 0.6)
        pts, valid = jax.jit(
            lambda k, r: z_filter_subsample(k, r, 1024)
        )(jax.random.PRNGKey(0), jnp.asarray(raw))
        assert pts.shape == (1024, 3)
        v = np.asarray(valid)
        z = np.asarray(pts)[:, 2]
        assert ((z[v] > 0.05) & (z[v] < 0.6)).all()

    def test_pads_when_too_few_valid(self):
        raw = np.zeros((100, 3), np.float32)
        raw[:10, 2] = 0.3  # only 10 valid
        pts, valid = z_filter_subsample(jax.random.PRNGKey(0), jnp.asarray(raw), 64)
        assert int(np.asarray(valid).sum()) == 10
        # invalid slots are zeroed
        assert np.allclose(np.asarray(pts)[~np.asarray(valid)], 0.0)

    def test_batched(self):
        raw = np.random.RandomState(0).rand(2, 1000, 3).astype(np.float32)
        raw[..., 2] = 0.3
        pts, valid = z_filter_subsample(jax.random.PRNGKey(1), jnp.asarray(raw), 256)
        assert pts.shape == (2, 256, 3)
        assert np.asarray(valid).all()


class TestNormalizeDevice:
    @pytest.mark.parametrize("mode", ["mean", "max", "stdev"])
    def test_matches_host(self, mode):
        from recognizer3d_tpu.data.preprocessing import normalize_cloud

        xyz = np.random.RandomState(0).randn(300, 3).astype(np.float32)
        host = normalize_cloud(xyz.copy(), mode)
        dev = normalize_cloud_device(jnp.asarray(xyz)[None], mode)[0]
        np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-4, atol=1e-6)


class TestDeviceDatasetCache:
    def _dataset(self, tmp_path, n=5):
        ds = Dataset(tmp_path / "ds")
        rng = np.random.RandomState(0)
        for i in range(n):
            ts = datetime(2026, 1, 1, 11, 0, i)
            cloud = rng.randn(150 + 17 * i, 3).astype(np.float32) * 0.1
            ds[ts] = cloud
            ann = np.zeros(cloud.shape[0], dtype=np.uint8)
            ann[rng.choice(cloud.shape[0], 5, replace=False)] = 1
            ds.set_annotation(ts, ann)
        return ds

    def test_batches_have_valid_points_only(self, tmp_path):
        ds = self._dataset(tmp_path)
        cache = DeviceDatasetCache(ds, n_points=64)
        pts, labs = cache.sample_batch(
            jax.random.PRNGKey(0), np.array([0, 4])
        )
        assert pts.shape == (2, 64, 3)
        assert labs.shape == (2, 64)
        # sample 4 has 218 valid points; all sampled points must be nonzero
        # (the clouds are random gaussians, zero-padding would show up)
        assert (np.abs(np.asarray(pts)).sum(axis=-1) > 0).all()

    def test_short_cloud_pads_with_real_duplicates(self, tmp_path):
        """Clouds shorter than n_points must be padded with random
        duplicates of real points (the host sampler's contract,
        preprocessing.sample_points) — not with the table's zero padding,
        which would inject fake origin points labeled background."""
        ds = Dataset(tmp_path / "short")
        rng = np.random.RandomState(3)
        ts = datetime(2026, 1, 2, 9, 0, 0)
        cloud = (rng.randn(40, 3).astype(np.float32) * 0.1) + 1.0  # no zeros
        ds[ts] = cloud
        ann = np.ones(40, dtype=np.uint8)  # all foreground
        ds.set_annotation(ts, ann)
        cache = DeviceDatasetCache(ds, n_points=64)
        pts, labs = cache.sample_batch(jax.random.PRNGKey(0), np.array([0]))
        pts, labs = np.asarray(pts)[0], np.asarray(labs)[0]
        # every sampled point must be one of the 40 real points
        d2 = ((pts[:, None, :] - cloud[None]) ** 2).sum(-1)
        assert d2.min(axis=1).max() == 0.0
        # labels ride along with the duplicated points
        assert (labs == 1).all()
        # all real points appear (top_k keeps the full valid prefix)
        assert len(np.unique(d2.argmin(axis=1))) == 40

    def test_zero_point_sample_rejected_at_build(self, tmp_path):
        # a degenerate zero-point capture must fail loudly at cache build,
        # not silently become n_points origin points labelled background
        ds = Dataset(tmp_path / "zp")
        ts = datetime(2026, 1, 2, 10, 0, 0)
        ds[ts] = np.ones((5, 3), dtype=np.float32)
        ds.set_annotation(ts, np.ones(5, dtype=np.uint8))
        empty = [(np.empty((0, 3), np.float32), np.empty((0, 0), np.float32),
                  np.empty((0,), np.int32))]
        with pytest.raises(ValueError, match="zero points"):
            DeviceDatasetCache(list(ds) + empty, n_points=16)

    def test_epoch_covers_dataset(self, tmp_path):
        ds = self._dataset(tmp_path)
        cache = DeviceDatasetCache(
            ds, n_points=32, augmentation_settings=AugmentationSettings()
        )
        batches = list(cache.epoch_batches(jax.random.PRNGKey(1), 2))
        assert len(batches) == 3  # 5 samples, batch 2 -> 2+2+1
        assert batches[-1][0].shape[0] == 1

    def test_epoch_batches_deterministic_in_key(self, tmp_path):
        """The host-side shuffle/key derivation (numpy seeded from the jax
        key) must be a pure function of the key: same key -> identical
        batches, different key -> a different epoch."""
        ds = self._dataset(tmp_path)
        cache = DeviceDatasetCache(ds, n_points=32)
        a = list(cache.epoch_batches(jax.random.PRNGKey(7), 2))
        b = list(cache.epoch_batches(jax.random.PRNGKey(7), 2))
        c = list(cache.epoch_batches(jax.random.PRNGKey(8), 2))
        for (pa, la), (pb, lb) in zip(a, b):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        assert any(
            not np.array_equal(np.asarray(pa), np.asarray(pc))
            for (pa, _), (pc, _) in zip(a, c)
            if pa.shape == pc.shape
        )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {
            "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "epoch": 7,
        }
        ckpt.save_checkpoint(tmp_path, 7, state)
        assert ckpt.latest_checkpoint(tmp_path) == 7
        restored = ckpt.restore_checkpoint(tmp_path)
        np.testing.assert_array_equal(
            restored["params"]["w"], state["params"]["w"]
        )
        assert int(restored["epoch"]) == 7

    def test_keep_prunes_old(self, tmp_path):
        for e in range(1, 6):
            ckpt.save_checkpoint(tmp_path, e, {"epoch": e}, keep=2)
        files = sorted(tmp_path.glob("ckpt_*.msgpack"))
        assert len(files) == 2
        assert ckpt.latest_checkpoint(tmp_path) == 5

    def test_trainer_checkpoints_and_resumes(self, tmp_path):
        ds = TestDeviceDatasetCache()._dataset(tmp_path, n=4)
        tiny = dict(
            n_classes=2, n_points=64, n_neighbors=4, decimation=2,
            layer_sizes=[4, 8, 16, 32], knn="naive",
        )
        model = Model(RandLANetSettings(**tiny), seed=0)
        train_ds, val_ds = ds.split()
        settings = TrainingSettings(
            epochs=2, batch_size=2, early_stopping=False, checkpoint_every=1,
        )
        model.train(
            train_ds, val_ds, settings, AugmentationSettings(),
            log_dir=tmp_path / "run", class_names=["bg", "fg"],
        )
        ckpt_dir = tmp_path / "run" / "checkpoints"
        assert ckpt.latest_checkpoint(ckpt_dir) == 2
        # resume: should skip straight past trained epochs
        epochs_seen = []
        model2 = Model(RandLANetSettings(**tiny), seed=1)
        settings2 = TrainingSettings(
            epochs=3, batch_size=2, early_stopping=False,
            checkpoint_every=1, resume=True,
        )
        model2.train(
            train_ds, val_ds, settings2, AugmentationSettings(),
            log_dir=tmp_path / "run", class_names=["bg", "fg"],
            callbacks=[lambda e, m: epochs_seen.append(e)],
        )
        assert epochs_seen == [3]


class TestDevicePipelineTraining:
    def test_trainer_with_device_pipeline(self, tmp_path):
        ds = TestDeviceDatasetCache()._dataset(tmp_path, n=4)
        tiny = dict(
            n_classes=2, n_points=64, n_neighbors=4, decimation=2,
            layer_sizes=[4, 8, 16, 32], knn="naive",
        )
        model = Model(RandLANetSettings(**tiny), seed=0)
        train_ds, val_ds = ds.split()
        seen = []
        model.train(
            train_ds,
            val_ds,
            TrainingSettings(
                epochs=2, batch_size=2, early_stopping=False,
                device_pipeline=True,
            ),
            AugmentationSettings(),
            class_names=["bg", "fg"],
            callbacks=[lambda e, m: seen.append(m)],
        )
        assert len(seen) == 2
        assert all(np.isfinite(m["loss"]) for m in seen)


class TestProfilingUtils:
    def test_warmup_and_timeit(self):
        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((64, 64))
        warmup(f, x)
        t = timeit(f, x, iters=3, warmup_iters=1)
        assert t > 0
        ta = timeit_amortized(f, x, iters=3)
        assert ta > 0


class TestCompileCache:
    def test_enable_points_xla_at_directory(self, tmp_path, monkeypatch):
        """enable_persistent_cache must create the directory, flip the jax
        config, and actually persist compiled executables there."""
        from recognizer3d_tpu.utils import compile_cache

        monkeypatch.setattr(compile_cache, "_enabled", False)
        prior = jax.config.jax_compilation_cache_dir
        cache_dir = tmp_path / "xla_cache"
        try:
            assert compile_cache.enable_persistent_cache(cache_dir)
            assert cache_dir.is_dir()
            assert str(jax.config.jax_compilation_cache_dir) == str(cache_dir)

            f = jax.jit(lambda x: jnp.sin(x) @ x.T)
            float(jnp.sum(f(jnp.ones((32, 16)))))
            assert any(cache_dir.iterdir()), "no cache entry written"
        finally:
            from jax._src import compilation_cache as _cc

            jax.config.update("jax_compilation_cache_dir", prior)
            if _cc.is_initialized():
                _cc.reset_cache()

    def test_disabled_by_env(self, monkeypatch):
        from recognizer3d_tpu.utils import compile_cache

        monkeypatch.setattr(compile_cache, "_enabled", False)
        monkeypatch.setenv("RECOGNIZER3D_COMPILE_CACHE", "0")
        assert not compile_cache.enable_persistent_cache()
