"""Unit tests for sampling, augmentation, losses and metrics.

Losses/metrics are checked against hand-computed cases and, where available,
against the reference semantics (see docstring citations in the modules)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recognizer3d_tpu.data import preprocessing
from recognizer3d_tpu.data.augmentation import (
    AugmentationSettings,
    perturbate_point_cloud,
)
from recognizer3d_tpu.training.losses import (
    cross_entropy_loss,
    focal_loss,
    focal_tversky_loss,
    get_loss,
)
from recognizer3d_tpu.training.metrics import accuracy, iou, MetricCollector


class TestSampling:
    def test_subsample_no_replacement(self):
        idx = preprocessing.sample_points(100, 50)
        assert idx.shape == (50,)
        assert len(np.unique(idx)) == 50
        assert idx.min() >= 0 and idx.max() < 100

    def test_upsample_pads_with_duplicates(self):
        idx = preprocessing.sample_points(30, 100)
        assert idx.shape == (100,)
        # the first 30 are a permutation of all points
        assert sorted(idx[:30]) == list(range(30))

    def test_consistent_sampling_is_deterministic_and_state_preserving(self):
        np.random.seed(1234)
        before = np.random.get_state()[1].copy()
        a = preprocessing.sample_points(1000, 100, consistent=True)
        after = np.random.get_state()[1].copy()
        b = preprocessing.sample_points(1000, 100, consistent=True)
        assert np.array_equal(a, b)
        # global RNG state untouched (preprocessing.py:23-31 contract)
        assert np.array_equal(before, after)

    def test_consistent_matches_seed0_choice(self):
        expected_state = np.random.get_state()
        np.random.seed(0)
        expected = np.random.choice(1000, 100, replace=False)
        np.random.set_state(expected_state)
        got = preprocessing.sample_points(1000, 100, consistent=True)
        assert np.array_equal(got, expected)

    def test_cached_consistent_indices(self):
        a = preprocessing.consistent_sample_indices(5000, 250)
        b = preprocessing.sample_points(5000, 250, consistent=True)
        assert np.array_equal(a, b)

    def test_device_sampler_shapes(self):
        import jax

        idx = preprocessing.sample_points_device(jax.random.PRNGKey(0), 100, 40)
        assert idx.shape == (40,)
        assert len(np.unique(np.asarray(idx))) == 40
        idx = preprocessing.sample_points_device(jax.random.PRNGKey(0), 30, 100)
        assert idx.shape == (100,)
        assert sorted(np.asarray(idx[:30])) == list(range(30))

    def test_sample_points_balanced_and_equal(self):
        labels = np.array([0] * 90 + [1] * 10)
        idx = preprocessing.sample_points_balanced(labels, 20)
        assert idx.shape == (20,)
        idx = preprocessing.sample_points_equal(labels, 20)
        assert idx.shape == (20,)
        idx = preprocessing.sample_points_factor(100, 0.25)
        assert idx.shape == (25,)


class TestAugmentation:
    def test_shapes_and_locality(self):
        np.random.seed(0)
        xyz = np.random.randn(500, 3)
        out = perturbate_point_cloud(xyz, AugmentationSettings())
        assert out.shape == xyz.shape
        # small perturbations: clouds stay close
        assert np.abs(out - xyz).mean() < 1.0

    def test_device_augmentation_matches_host_statistics(self):
        import jax

        np.random.seed(0)
        xyz = np.random.randn(4, 256, 3).astype(np.float32)
        from recognizer3d_tpu.data.augmentation import (
            perturbate_point_cloud_device,
        )

        out = perturbate_point_cloud_device(
            jax.random.PRNGKey(0), jnp.asarray(xyz), AugmentationSettings()
        )
        assert out.shape == xyz.shape
        assert np.abs(np.asarray(out) - xyz).mean() < 1.0

    def test_zero_settings_close_to_identity(self):
        settings = AugmentationSettings(
            jitter_variance=0.0,
            scale_limit=0.0,
            shift_limit=0.0,
            rotation_angle_variances=(0.0, 0.0, 0.0),
        )
        xyz = np.random.randn(100, 3)
        out = perturbate_point_cloud(xyz, settings)
        np.testing.assert_allclose(out, xyz, atol=1e-12)


class TestLosses:
    def test_cross_entropy_hand_case(self):
        logits = jnp.asarray([[[0.0, 0.0], [0.0, 0.0]]])  # (1, 2, 2) uniform
        labels = jnp.asarray([[0, 1]])
        loss = cross_entropy_loss(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-6)

    def test_focal_reduces_to_weighted_ce(self):
        logits = jnp.asarray(np.random.randn(2, 3, 5).astype(np.float32))
        labels = jnp.asarray(np.random.randint(0, 3, (2, 5)))
        # gamma=0 -> plain CE summed over all classes of one-hot (=CE), /B*N
        loss_g0 = focal_loss(logits, labels, gamma=0.0)
        ce = cross_entropy_loss(logits, labels)
        # focal with gamma 0 sums -y_true log p over classes = CE per point
        np.testing.assert_allclose(float(loss_g0), float(ce), rtol=1e-4)

    def test_dice_perfect_prediction_low_loss(self):
        # strongly confident correct logits -> near-zero dice loss
        labels = jnp.asarray([[0, 1, 1, 0]])
        logits = jnp.asarray(
            [[[10.0, -10.0, -10.0, 10.0], [-10.0, 10.0, 10.0, -10.0]]]
        )
        loss = focal_tversky_loss(logits, labels, alpha=0.5, gamma=1.0)
        assert float(loss) < 1e-3

    def test_dice_hand_case(self):
        # uniform predictions on a 2-class problem, half the points positive:
        # per non-background class: tp = 0.5*N_pos, fn = 0.5*N_pos,
        # fp = 0.5*N_neg -> TI = N_pos/(N_pos + 0.5*N_pos + 0.5*N_neg)
        labels = jnp.asarray([[1, 1, 0, 0]])
        logits = jnp.zeros((1, 2, 4))
        loss = focal_tversky_loss(logits, labels, alpha=0.5, gamma=1.0)
        tp, fn, fp = 1.0, 1.0, 1.0
        ti = tp / (tp + 0.5 * fn + 0.5 * fp)
        np.testing.assert_allclose(float(loss), 1 - ti, rtol=1e-5)

    def test_dispatch_table(self):
        for name in ["cross_entropy", "focal", "dice", "tversky", "focal_tversky"]:
            fn = get_loss(name)
            logits = jnp.asarray(np.random.randn(1, 2, 8).astype(np.float32))
            labels = jnp.asarray(np.random.randint(0, 2, (1, 8)))
            val = float(fn(logits, labels))
            assert np.isfinite(val)
        with pytest.raises(ValueError):
            get_loss("nope")


class TestMetrics:
    def test_accuracy_hand_case(self):
        # predictions: argmax -> [0, 1, 1]; labels [0, 1, 0]
        logits = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])[None]  # (1,2,3)
        labels = jnp.asarray([[0, 1, 0]])
        overall, per_class = accuracy(logits, labels)
        np.testing.assert_allclose(overall, 2.0 / 3.0, rtol=1e-6)
        np.testing.assert_allclose(per_class[0], 0.5, rtol=1e-6)
        np.testing.assert_allclose(per_class[1], 1.0, rtol=1e-6)

    def test_accuracy_empty_class_fallback(self):
        # no labels of class 1 and no predictions of it -> 1.0 (metrics.py:27-28)
        logits = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])[None]
        labels = jnp.asarray([[0, 0]])
        _, per_class = accuracy(logits, labels)
        assert per_class[1] == 1.0

    def test_iou_hand_case(self):
        logits = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])[None]
        labels = jnp.asarray([[0, 1, 0]])
        miou, per_class = iou(logits, labels)
        # class 0: inter 1, union 2 -> 0.5 ; class 1: inter 1, union 2 -> 0.5
        np.testing.assert_allclose(per_class, [0.5, 0.5], rtol=1e-6)
        np.testing.assert_allclose(miou, 0.5, rtol=1e-6)

    def test_iou_empty_union_is_one(self):
        logits = jnp.asarray([[1.0], [0.0]])[None]
        labels = jnp.asarray([[0]])
        _, per_class = iou(logits, labels)
        assert per_class[1] == 1.0

    def test_metric_collector_averaging(self):
        mc = MetricCollector(["bg", "fg"])
        mc.push(1.0, 0.5, [0.5, 0.5], 0.25, [0.25, 0.25])
        mc.push(3.0, 1.0, [1.0, 1.0], 0.75, [0.75, 0.75])
        d = mc.as_dict("val")
        assert d["val_loss"] == 2.0
        assert d["val_OA"] == 0.75
        assert d["val_mIoU"] == 0.5
        assert d["val_bg IoU"] == 0.5


class TestEarlyStopper:
    def _stopper(self, patience=2):
        from recognizer3d_tpu.training.early_stopper import EarlyStopper

        return EarlyStopper(patience=patience, metric="val_mIoU")

    def test_snapshots_best_and_stops_after_patience(self):
        es = self._stopper(patience=2)
        assert es.check({"val_mIoU": 0.5}, {"w": 1})
        assert es.check({"val_mIoU": 0.7}, {"w": 2})
        assert es.check({"val_mIoU": 0.6}, {"w": 3})  # stale 1/2
        assert not es.check({"val_mIoU": 0.6}, {"w": 4})  # stale 2/2 -> stop
        assert es.best_variables == {"w": 2}

    def test_tie_counts_as_improvement(self):
        es = self._stopper(patience=1)
        assert es.check({"val_mIoU": 0.5}, {"w": 1})
        assert es.check({"val_mIoU": 0.5}, {"w": 2})  # tie resets staleness
        assert es.best_variables == {"w": 2}  # last of the equally-good

    def test_unknown_metric_never_stops(self):
        es = self._stopper(patience=1)
        for _ in range(5):
            assert es.check({"loss": 1.0}, {"w": 0})
        assert es.best_variables is None

    def test_min_mode(self):
        from recognizer3d_tpu.training.early_stopper import EarlyStopper

        es = EarlyStopper(patience=1, metric="val_loss", mode="min")
        assert es.check({"val_loss": 1.0}, {"w": 1})
        assert es.check({"val_loss": 0.5}, {"w": 2})
        assert not es.check({"val_loss": 0.9}, {"w": 3})
        assert es.best_variables == {"w": 2}
