"""Model facade: save/load round trip, predict contracts, evaluate protocol,
and a short end-to-end training run on tiny settings."""

from datetime import datetime
from pathlib import Path

import numpy as np
import pytest

from recognizer3d_tpu import (
    AugmentationSettings,
    Dataset,
    Model,
    RandLANetSettings,
    TrainingSettings,
)

TINY = dict(
    n_classes=2,
    n_points=64,
    n_features=0,
    n_neighbors=4,
    decimation=2,
    layer_sizes=[4, 8, 16, 32],
    knn="naive",
)


@pytest.fixture(scope="module")
def tiny_model():
    return Model(RandLANetSettings(**TINY), seed=0)


@pytest.fixture()
def tiny_dataset(tmp_path):
    ds = Dataset(tmp_path / "ds")
    rng = np.random.RandomState(0)
    for i in range(6):
        ts = datetime(2026, 1, 1, 10, 0, i)
        cloud = rng.randn(200, 3).astype(np.float32) * 0.1
        ds[ts] = cloud
        ann = np.zeros(200, dtype=np.uint8)
        ann[rng.choice(200, 10, replace=False)] = 1
        ds.set_annotation(ts, ann)
    return ds


class TestPredict:
    def test_unbatched_shape_and_softmax(self, tiny_model):
        cloud = np.random.RandomState(0).randn(500, 3).astype(np.float32)
        conf = tiny_model.predict(cloud)
        assert conf.shape == (2, 500)
        np.testing.assert_allclose(conf.sum(axis=0), 1.0, atol=1e-3)

    def test_batched(self, tiny_model):
        clouds = np.random.RandomState(0).randn(3, 500, 3).astype(np.float32)
        conf = tiny_model.predict(clouds)
        assert conf.shape == (3, 2, 500)

    def test_batched_per_cloud_forward_matches_joint(self, monkeypatch):
        # past _BATCHED_PER_CLOUD_MIN total points, batched eval forwards
        # run per cloud (lax.map); eval-mode BN reads running stats so the
        # result matches the joint batched program to float tolerance
        from recognizer3d_tpu.models import facade

        import jax.numpy as jnp

        settings = RandLANetSettings(**TINY)
        x = jnp.asarray(
            np.random.RandomState(1).randn(3, 64, 3).astype(np.float32)
        )
        perm = jnp.arange(64, dtype=np.int32)
        model = Model(settings, seed=0)
        joint = np.asarray(model._forward_jit(model.variables, x, perm))

        monkeypatch.setattr(facade, "_BATCHED_PER_CLOUD_MIN", 100)
        per_cloud_model = Model(settings, seed=0)
        per_cloud = np.asarray(
            per_cloud_model._forward_jit(per_cloud_model.variables, x, perm)
        )
        np.testing.assert_allclose(per_cloud, joint, atol=1e-6, rtol=1e-5)

    def test_tiny_cloud_padded(self, tiny_model):
        # the reference warms up with a 30-point cloud (predict.py:23-24)
        cloud = np.random.RandomState(0).random((30, 3)).astype(np.float32)
        conf = tiny_model.predict(cloud)
        assert conf.shape == (2, 30)

    def test_predict_mask_matches_thresholded_predict(self, tiny_model):
        """The device-side mask fast path must equal thresholding the
        (C, N) confidences on the host (same permutation => same draw)."""
        cloud = np.random.RandomState(1).randn(500, 3).astype(np.float32)
        np.random.seed(42)
        conf = tiny_model.predict(cloud)
        np.random.seed(42)  # same per-call permutation draw
        mask = tiny_model.predict_mask(cloud, 0.5)
        assert mask.shape == (500,) and mask.dtype == bool
        np.testing.assert_array_equal(mask, conf[1] > 0.5)

    def test_transfer_dtype_float16_close_to_float32(self):
        """The f16 upload path quantizes only the INPUT coordinates (device
        compute stays f32); predictions must track the f32 path closely and
        the thresholded masks should agree except near the boundary."""
        settings = RandLANetSettings(**TINY)
        f32 = Model(settings, seed=0)
        f16 = Model(settings, seed=0, transfer_dtype="float16")
        cloud = (
            np.random.RandomState(2).randn(5000, 3).astype(np.float32) * 0.1
        )
        np.random.seed(7)
        conf32 = f32.predict(cloud)
        np.random.seed(7)
        conf16 = f16.predict(cloud)
        assert conf16.shape == conf32.shape
        # inputs differ by ~5e-4 relative; confidences must stay close
        assert np.mean(np.abs(conf16 - conf32)) < 5e-3
        agree = np.mean((conf16[1] > 0.5) == (conf32[1] > 0.5))
        assert agree > 0.99, agree

    def test_latency_surface_defaults_to_f16_upload(self, tiny_model, tmp_path):
        """The live/serving surfaces (Predictor) default to float16 uploads;
        the parity surface (Model) stays float32 (VERDICT r2 weak #1)."""
        from predict import Predictor

        assert tiny_model._transfer_dtype == np.dtype(np.float32)
        archive = tmp_path / "tiny_model"
        tiny_model.save(archive)
        predictor = Predictor(archive, warmup_points=64)
        assert predictor._model._transfer_dtype == np.dtype(np.float16)
        mask = predictor.predict(
            np.random.RandomState(0).randn(300, 3).astype(np.float32) * 0.1
        )
        assert mask.shape == (300,) and mask.dtype == bool

    def test_bucket_padding_does_not_change_results(self, tiny_model):
        # proportional buckets pad the full cloud with zeros; padded rows
        # are queries only and must not perturb the real points' output
        from recognizer3d_tpu.models.facade import _bucket

        rng = np.random.RandomState(1)
        n = 5000  # not a bucket boundary
        assert _bucket(n) != n
        cloud = rng.randn(n, 3).astype(np.float32) * 0.1
        conf = tiny_model.predict(cloud)
        assert conf.shape == (2, n)
        np.testing.assert_allclose(conf.sum(axis=0), 1.0, atol=1e-3)
        # growing the cloud within / past the bucket boundary still works
        for extra in (1, _bucket(n) - n + 1):
            bigger = np.concatenate([cloud, cloud[:extra]], axis=0)
            conf2 = tiny_model.predict(bigger)
            assert conf2.shape == (2, n + extra)

    def test_bucket_sizes_monotone_and_bounded(self):
        from recognizer3d_tpu.models.facade import _bucket

        prev = 0
        for n in [1, 100, 4096, 4097, 30_000, 140_801, 160_998, 1_000_000]:
            b = _bucket(n)
            assert b >= n and b >= prev
            assert b - n <= max(4096, n // 8)  # waste bounded
            prev = b

    def test_no_prepostprocess(self, tiny_model):
        cloud = np.random.RandomState(0).randn(64, 3).astype(np.float32)
        conf = tiny_model.predict(cloud, prepostprocess=False)
        assert conf.shape == (2, 64)

    def test_upsampling_none_disables_prepost(self):
        settings = RandLANetSettings(**{**TINY, "upsampling": "none"})
        model = Model(settings, seed=0)
        cloud = np.random.RandomState(0).randn(64, 3).astype(np.float32)
        conf = model.predict(cloud)  # prepost forced off
        assert conf.shape == (2, 64)


class TestSaveLoad:
    def test_round_trip_preserves_predictions(self, tiny_model, tmp_path):
        path = tmp_path / "model_archive"
        tiny_model.save(path)
        loaded = Model.load(path)
        cloud = np.random.RandomState(1).randn(300, 3).astype(np.float32)
        np.random.seed(7)
        a = tiny_model.predict(cloud)
        np.random.seed(7)
        b = loaded.predict(cloud)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_load_kwarg_overrides(self, tiny_model, tmp_path):
        path = tmp_path / "model_archive"
        tiny_model.save(path)
        loaded = Model.load(path, knn="approximate", upsampling="idw")
        assert loaded.settings.knn == "approximate"
        assert loaded.settings.upsampling == "idw"

    def test_bfloat16_round_trip_and_close_to_float32(
        self, tiny_model, tmp_path
    ):
        # the bf16 compute mode shares weights with f32 (params stay f32),
        # survives the archive round trip, and its predictions stay close:
        # geometry/KNN are exact, only the feature chain loses mantissa bits
        path = tmp_path / "model_archive"
        tiny_model.save(path)
        bf16 = Model.load(path, compute_dtype="bfloat16")
        assert bf16.settings.compute_dtype == "bfloat16"
        cloud = np.random.RandomState(1).randn(300, 3).astype(np.float32) * 0.2
        ref = tiny_model.predict(cloud)
        got = bf16.predict(cloud)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got.sum(axis=0), 1.0, atol=1e-2)
        # confidences agree to bf16-level tolerance on an untrained model
        assert np.mean(np.abs(got - ref)) < 0.05

    def test_missing_file_asserts(self, tmp_path):
        with pytest.raises(AssertionError):
            Model.load(tmp_path / "nope")


class TestTrainEvaluate:
    def test_short_training_improves_and_saves(self, tiny_dataset, tmp_path):
        model = Model(RandLANetSettings(**TINY), seed=0)
        train_ds, val_ds = tiny_dataset.split()
        seen = []
        model.train(
            train_ds,
            val_ds,
            TrainingSettings(
                epochs=2, batch_size=2, learning_rate=1e-2,
                early_stopping=False,
            ),
            AugmentationSettings(),
            log_dir=tmp_path / "logs",
            class_names=["background", "fingerpoint"],
            callbacks=[lambda epoch, metrics: seen.append((epoch, metrics))],
        )
        assert [e for e, _ in seen] == [1, 2]
        for _, metrics in seen:
            assert "loss" in metrics and "val_mIoU" in metrics
            assert np.isfinite(metrics["loss"])
        # scalar log written (fallback or TB event files)
        assert any((tmp_path / "logs").iterdir())

    def test_short_training_runs_in_bfloat16(self, tiny_dataset, tmp_path):
        # mixed-precision training: activations bf16, params/BN stats f32
        model = Model(
            RandLANetSettings(**TINY, compute_dtype="bfloat16"), seed=0
        )
        train_ds, val_ds = tiny_dataset.split()
        seen = []
        model.train(
            train_ds,
            val_ds,
            TrainingSettings(
                epochs=1, batch_size=2, learning_rate=1e-2,
                early_stopping=False,
            ),
            AugmentationSettings(),
            log_dir=tmp_path / "logs",
            class_names=["background", "fingerpoint"],
            callbacks=[lambda epoch, metrics: seen.append(metrics)],
        )
        assert seen and np.isfinite(seen[0]["loss"])
        params = model.variables["params"]
        import jax

        assert all(
            a.dtype == np.float32 for a in jax.tree.leaves(params)
        ), "bf16 mode must keep float32 master weights"

    def test_class_names_length_asserted(self, tiny_dataset):
        model = Model(RandLANetSettings(**TINY), seed=0)
        with pytest.raises(AssertionError):
            model.train(
                tiny_dataset, tiny_dataset, class_names=["just_one"]
            )

    def test_evaluate_protocol(self, tiny_dataset):
        model = Model(RandLANetSettings(**TINY), seed=0)
        metrics = model.evaluate(
            tiny_dataset, class_names=["bg", "fg"], batch_size=3
        )
        for key in ["loss", "OA", "mAcc", "mIoU", "bg IoU", "fg IoU"]:
            assert key in metrics
        with_std = model.evaluate(
            tiny_dataset, class_names=["bg", "fg"], batch_size=3,
            include_stdev=True,
        )
        assert isinstance(with_std["mIoU"], tuple)

    def test_evaluate_fused_matches_per_batch_path(self, tiny_dataset):
        """The fused lax.map sweep (one dispatch per shape group) must
        reproduce the per-(seed, batch) loop bit-for-bit: same batches (the
        consistent-sampling contract) and the same permutation draws."""
        from recognizer3d_tpu.data.loader import get_data_loader
        from recognizer3d_tpu.training.trainer import Trainer

        model = Model(RandLANetSettings(**TINY), seed=0)
        make_loader = lambda: get_data_loader(
            tiny_dataset, model.settings.n_points, batch_size=4,
            shuffle=False, consistent_sampling=True,
        )
        fused_loader = make_loader()
        assert fused_loader.dataset._cacheable
        fused = Trainer.evaluate(
            model, fused_loader, ["bg", "fg"], n_evaluations=3
        ).as_dict(include_stdev=True)

        slow_loader = make_loader()
        slow_loader.dataset._cacheable = False  # forces the per-batch loop
        slow = Trainer.evaluate(
            model, slow_loader, ["bg", "fg"], n_evaluations=3
        ).as_dict(include_stdev=True)

        assert fused.keys() == slow.keys()
        for key in fused:
            np.testing.assert_allclose(
                fused[key], slow[key], rtol=1e-5, atol=1e-6, err_msg=key
            )

    def test_evaluate_postprocess(self, tiny_dataset):
        model = Model(RandLANetSettings(**TINY), seed=0)
        metrics = model.evaluate(
            tiny_dataset, class_names=["bg", "fg"], batch_size=1,
            postprocess=True,
        )
        assert np.isfinite(metrics["mIoU"])


class TestFusedRPEMLP:
    """The fused mlp_rpe1 (models/randlanet.py FusedRPEMLP) must equal the
    reference's unfused formulation: Dense over the explicit 10-channel
    [center, neighbour, center − neighbour, distance] encoding
    (reference modules.py:153-186, :289)."""

    def test_matches_unfused_dense(self):
        import jax
        import jax.numpy as jnp

        from recognizer3d_tpu.models.randlanet import (
            FusedRPEMLP,
            gather_neighbors,
            relative_position_encoding,
        )
        from recognizer3d_tpu.ops.knn import knn

        rng = np.random.RandomState(0)
        xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
        half = 8
        neighbors, d2 = knn(xyz, xyz, 4, "naive")
        dist = jnp.sqrt(d2)

        mod = FusedRPEMLP(half)
        q = mod.init(
            jax.random.PRNGKey(1),
            xyz,
            jnp.zeros((2, 64, 4, half), jnp.float32),
            dist,
        )
        q_rows = mod.apply(q, xyz, method=FusedRPEMLP.support_projection)
        fused = mod.apply(
            q, xyz, gather_neighbors(q_rows, neighbors), dist, train=False
        )

        # unfused: explicit 10-channel encoding through the same weights
        rpe = relative_position_encoding(
            xyz, neighbors, dist, gather_neighbors(xyz, neighbors)
        )
        kernel = q["params"]["conv"]["kernel"]
        bias = q["params"]["conv"]["bias"]
        dense = rpe @ kernel + bias
        scale = q["params"]["batch_norm"]["scale"]
        shift = q["params"]["batch_norm"]["bias"]
        mean = q["batch_stats"]["batch_norm"]["mean"]
        var = q["batch_stats"]["batch_norm"]["var"]
        ref = (dense - mean) / np.sqrt(var + 1e-6) * scale + shift
        ref = np.maximum(np.asarray(ref), 0.0)
        np.testing.assert_allclose(
            np.asarray(fused), ref, atol=1e-5, rtol=1e-4
        )


class TestEvaluateRecallCheck:
    """Model.evaluate's opt-out sampled recall check when
    knn="approximate" (VERDICT r3 #6)."""

    APPROX = {**TINY, "knn": "approximate"}

    def test_warns_when_recall_low(self, tiny_dataset, monkeypatch, caplog):
        import logging

        import recognizer3d_tpu.ops.knn as knn_mod

        monkeypatch.delenv("RECOGNIZER3D_KNN_RECALL", raising=False)
        monkeypatch.setattr(
            knn_mod, "measure_recall", lambda *a, **k: 0.5
        )
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        with caplog.at_level(logging.WARNING):
            model.evaluate(tiny_dataset, class_names=["bg", "fg"],
                           batch_size=3)
        assert any(
            "recall" in r.getMessage() and "0.500" in r.getMessage()
            for r in caplog.records
        ), [r.getMessage() for r in caplog.records]

    def test_no_warning_when_recall_fine(self, tiny_dataset, caplog):
        import logging

        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        with caplog.at_level(logging.WARNING):
            model.evaluate(tiny_dataset, class_names=["bg", "fg"],
                           batch_size=3)
        assert not any(
            "recall" in r.getMessage() for r in caplog.records
        )

    def test_opt_out_env_skips_check(self, tiny_dataset, monkeypatch):
        import recognizer3d_tpu.ops.knn as knn_mod

        called = {}
        monkeypatch.setenv("RECOGNIZER3D_KNN_RECALL", "0")
        monkeypatch.setattr(
            knn_mod, "measure_recall",
            lambda *a, **k: called.setdefault("hit", True) or 1.0,
        )
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        model.evaluate(tiny_dataset, class_names=["bg", "fg"], batch_size=3)
        assert "hit" not in called

    def test_exact_knn_skips_check(self, tiny_dataset, monkeypatch):
        import recognizer3d_tpu.ops.knn as knn_mod

        called = {}
        monkeypatch.delenv("RECOGNIZER3D_KNN_RECALL", raising=False)
        monkeypatch.setattr(
            knn_mod, "measure_recall",
            lambda *a, **k: called.setdefault("hit", True) or 1.0,
        )
        model = Model(RandLANetSettings(**TINY), seed=0)
        model.evaluate(tiny_dataset, class_names=["bg", "fg"], batch_size=3)
        assert "hit" not in called


class TestRecallGuardFacade:
    """Model-level integration of the runtime recall guard (VERDICT r4
    #1): the session-first-frame trigger in predict/predict_mask/train,
    the evaluate-path upgrade, the opt-out, and the epoch-keyed retrace
    of the jitted programs."""

    APPROX = {**TINY, "knn": "approximate"}

    @pytest.fixture(autouse=True)
    def _reset(self):
        import recognizer3d_tpu.ops.knn as knn_mod

        knn_mod.reset_window_guard()
        yield
        knn_mod.reset_window_guard()

    def _spy_guard(self, monkeypatch, regime=True):
        import recognizer3d_tpu.ops.knn as knn_mod

        calls = []
        monkeypatch.setattr(
            knn_mod, "window_regime_active", lambda n: regime
        )
        monkeypatch.setattr(
            knn_mod,
            "ensure_window_recall",
            lambda cloud, k, **kw: calls.append((np.shape(cloud), k)) or {},
        )
        return calls

    def test_predict_triggers_guard_once(self, monkeypatch):
        calls = self._spy_guard(monkeypatch)
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        cloud = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        model.predict(cloud)
        model.predict(cloud)
        assert len(calls) == 1
        # probed at the model's n_points with xyz columns only
        assert calls[0] == ((self.APPROX["n_points"], 3), self.APPROX["n_neighbors"])

    def test_predict_mask_triggers_guard(self, monkeypatch):
        calls = self._spy_guard(monkeypatch)
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        cloud = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        model.predict_mask(cloud, 0.5)
        assert len(calls) == 1

    def test_below_regime_no_guard(self, monkeypatch):
        calls = self._spy_guard(monkeypatch, regime=False)
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        cloud = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        model.predict(cloud)
        assert calls == []

    def test_exact_knn_no_guard(self, monkeypatch):
        calls = self._spy_guard(monkeypatch)
        model = Model(RandLANetSettings(**TINY), seed=0)
        cloud = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        model.predict(cloud)
        assert calls == []

    def test_opt_out_env(self, monkeypatch):
        calls = self._spy_guard(monkeypatch)
        monkeypatch.setenv("RECOGNIZER3D_KNN_RECALL", "0")
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        cloud = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        model.predict(cloud)
        assert calls == []

    def test_evaluate_window_regime_runs_acting_guard(
        self, tiny_dataset, monkeypatch
    ):
        calls = self._spy_guard(monkeypatch)
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        model.evaluate(tiny_dataset, class_names=["bg", "fg"], batch_size=3)
        assert len(calls) == 1

    def test_guarded_jit_retraces_on_epoch_change(self):
        import jax.numpy as jnp

        import recognizer3d_tpu.ops.knn as knn_mod
        from recognizer3d_tpu.models.facade import _GuardedJit

        traces = []

        def fn(x):
            traces.append(1)
            return x * 2

        g = _GuardedJit(fn)
        x = jnp.ones((4,))
        g(x)
        g(x)
        assert len(traces) == 1  # cached
        knn_mod._session_guard["epoch"] += 1  # guard acted
        try:
            g(x)
        finally:
            knn_mod._session_guard["epoch"] -= 1
        assert len(traces) == 2  # retraced with the new routing

    def test_widened_window_changes_model_routing_end_to_end(
        self, monkeypatch
    ):
        """Full-stack: the first predict runs the guard (default ladder),
        the guard widens the session window, and the forward traced right
        after must actually search with the widened window (spy on
        knn_window's window_points at trace time)."""
        import recognizer3d_tpu.ops.knn as knn_mod

        # put the tiny model's self-KNNs in the window regime, with a
        # tiny ladder scaled to the 64-point cloud
        monkeypatch.setattr(knn_mod, "_WINDOW_MIN_SUPPORT", 16)
        monkeypatch.setattr(knn_mod, "_NAIVE_MAX_MN", 256)
        monkeypatch.setattr(knn_mod, "_WINDOW_LADDER", (24, 48))
        knn_mod.reset_window_guard()  # start at the new ladder's rung 0
        seen = []
        orig = knn_mod.knn_window
        monkeypatch.setattr(
            knn_mod,
            "knn_window",
            lambda *a, **kw: seen.append(kw.get("window_points"))
            or orig(*a, **kw),
        )
        monkeypatch.setattr(
            knn_mod, "_window_recall_probe",
            lambda x, k, w: 0.95 if w >= 48 else 0.5,
        )
        model = Model(RandLANetSettings(**self.APPROX), seed=0)
        cloud = np.random.RandomState(0).rand(500, 3).astype(np.float32)
        model.predict(cloud)  # guard first: probes 24 (0.5) -> installs 48
        assert knn_mod.session_window_points() == 48
        assert 48 in seen  # the traced forward used the widened window


class TestSortedFlowHook:
    """The RECOGNIZER3D_SORTED_FLOW=0 A/B hook (CLAUDE.md invariant: the
    legacy r3 per-level-unsort flow must stay BIT-IDENTICAL to the default
    sorted-domain flow). ADVICE r4: the hook was only ever checked manually
    via benchmarks/ablate_sorted_flow.py — this pins it in the suite so the
    dead-by-default legacy branches (incl. upsample_nni's inv_fine path)
    cannot silently rot."""

    def test_sorted_flow_off_is_bit_identical(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from recognizer3d_tpu.models import randlanet as rl

        # non-trivial depth (3 levels survive 512/4^l >= min size) and a
        # feature column so the decoder skip/upsample branches all execute
        s = RandLANetSettings(
            n_classes=2, n_points=512, n_features=1, n_neighbors=8,
            decimation=4, layer_sizes=[8, 16, 32], knn="naive",
        )
        net = rl.RandLANet(s)
        rng = np.random.RandomState(0)
        x = jnp.asarray(
            np.concatenate(
                [rng.randn(1, 512, 3).astype(np.float32) * 0.2,
                 rng.rand(1, 512, 1).astype(np.float32)],
                axis=-1,
            )
        )
        perm = jnp.asarray(rng.permutation(512).astype(np.int32))
        variables = net.init(jax.random.PRNGKey(0), x, perm, train=False)

        # module.apply re-traces every call, so each run reads the env
        # fresh at trace time
        monkeypatch.setenv("RECOGNIZER3D_SORTED_FLOW", "1")
        logits_sorted = np.asarray(net.apply(variables, x, perm, train=False))
        monkeypatch.setenv("RECOGNIZER3D_SORTED_FLOW", "0")
        logits_legacy = np.asarray(net.apply(variables, x, perm, train=False))
        np.testing.assert_array_equal(logits_sorted, logits_legacy)
