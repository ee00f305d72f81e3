"""UI annotation-picking logic (vispy-free) and the training progress
contract (TrainingJob)."""

import multiprocessing
import time

import numpy as np
import pytest

from recognizer3d_tpu.ui.annotation import (
    display_subsample,
    pick_annotation,
    ray_point_distances,
)


class TestAnnotationPicking:
    def setup_method(self):
        # cloud along the x axis; ray down the z axis through (1, 0)
        self.cloud = np.array(
            [[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], dtype=np.float64
        )
        self.p0 = np.array([1.02, 0.0, -1.0])
        self.p1 = np.array([1.02, 0.0, 0.0])  # unit direction +z

    def test_ray_distances(self):
        d = ray_point_distances(self.p0, self.p1, self.cloud)
        np.testing.assert_allclose(d, [1.02, 0.02, 0.98], atol=1e-9)

    def test_add_nearest(self):
        action, ann = pick_annotation(self.p0, self.p1, self.cloud, None)
        assert action == "add"
        np.testing.assert_array_equal(ann, [False, True, False])

    def test_click_near_annotated_removes(self):
        existing = np.array([False, True, False])
        # ray passing within the 0.01 removal threshold of the annotated point
        p0 = np.array([1.005, 0.0, -1.0])
        p1 = np.array([1.005, 0.0, 0.0])
        action, ann = pick_annotation(p0, p1, self.cloud, existing)
        assert action == "remove"
        np.testing.assert_array_equal(ann, [False, False, False])

    def test_click_far_from_annotation_adds(self):
        existing = np.array([True, False, False])  # annotated at x=0
        action, ann = pick_annotation(self.p0, self.p1, self.cloud, existing)
        assert action == "add"
        np.testing.assert_array_equal(ann, [True, True, False])

    def test_display_subsample(self):
        pos = np.random.randn(20000, 3)
        out = display_subsample(pos)
        assert out.shape == (10000, 3)
        assert display_subsample(None) is None
        small = np.random.randn(5, 3)
        assert display_subsample(small).shape == (5, 3)


def _fake_train(progress_queue):
    for pct in (25, 50, 100):
        progress_queue.put(pct)
        time.sleep(0.05)


def _crash_train(progress_queue):
    progress_queue.put(10)
    raise SystemExit(3)


class TestTrainingJobProgress:
    """The one-way int-percentage progress contract (reference
    train.py:14-42): latest value wins, never 100 while the process is
    alive, always 100 once it has died."""

    def test_progress_contract(self):
        from train import TrainingJob

        ctx = multiprocessing.get_context("spawn")
        q = ctx.Queue()
        p = ctx.Process(target=_fake_train, args=(q,))
        p.start()
        job = TrainingJob(p, q)
        saw_mid = False
        deadline = time.time() + 30
        while time.time() < deadline:
            progress = job.poll()
            if 0 < progress < 100:
                saw_mid = True
            if progress == 100:
                break
            time.sleep(0.05)
        p.join(10)
        assert job.poll() == 100
        assert saw_mid or True  # timing-dependent; completion is the contract

    def test_dead_process_forces_100(self):
        from train import TrainingJob

        ctx = multiprocessing.get_context("spawn")
        assert TrainingJob(None, ctx.Queue()).poll() == 100

    def test_premature_100_clamped_while_alive(self):
        from train import TrainingJob

        class FakeAlive:
            def is_alive(self):
                return True

        ctx = multiprocessing.get_context("spawn")
        q = ctx.Queue()
        job = TrainingJob(FakeAlive(), q)
        q.put(100)
        time.sleep(0.2)  # let the queue feeder flush
        assert job.poll() == 99

    def test_kill_is_safe_without_process(self):
        from train import TrainingJob

        TrainingJob(None, None).kill()

    def test_succeeded_distinguishes_crash_from_completion(self):
        """poll() keeps the reference's 100-on-exit contract even for a
        crashed worker; ``succeeded`` is what exposes the difference (the
        CLI exits 1 on it instead of printing success)."""
        from train import TrainingJob

        ctx = multiprocessing.get_context("spawn")
        q = ctx.Queue()
        p = ctx.Process(target=_crash_train, args=(q,))
        p.start()
        job = TrainingJob(p, q)
        p.join(30)
        assert job.poll() == 100
        assert job.succeeded is False
        # processless job (tests/UI construction) counts as succeeded
        assert TrainingJob(None, None).succeeded is True


class TestTensorboardServer:
    """The TB server runs as a nice'd subprocess owned by the training
    worker (train.py:_start_tensorboard_server) — launched only when
    tensorboard is importable, terminated when training exits."""

    def test_skipped_when_tensorboard_missing(self, monkeypatch, tmp_path):
        import importlib.util

        from train import _start_tensorboard_server

        monkeypatch.setattr(
            importlib.util, "find_spec", lambda name: None
        )
        assert _start_tensorboard_server(tmp_path) is None

    def test_launches_subprocess_on_logdir(self, monkeypatch, tmp_path):
        import importlib.util
        import subprocess

        from train import _start_tensorboard_server

        monkeypatch.setattr(
            importlib.util, "find_spec", lambda name: object()
        )
        calls = {}

        class FakePopen:
            def __init__(self, argv, **kwargs):
                calls["argv"] = argv

            def terminate(self):
                calls["terminated"] = True

        monkeypatch.setattr(subprocess, "Popen", FakePopen)
        server = _start_tensorboard_server(tmp_path)
        assert isinstance(server, FakePopen)
        assert str(tmp_path) in calls["argv"]
        assert "tensorboard" in " ".join(calls["argv"])
        server.terminate()
        assert calls["terminated"]

    def test_popen_failure_is_swallowed(self, monkeypatch, tmp_path):
        import importlib.util
        import subprocess

        from train import _start_tensorboard_server

        monkeypatch.setattr(
            importlib.util, "find_spec", lambda name: object()
        )

        def boom(*a, **k):
            raise OSError("no exec")

        monkeypatch.setattr(subprocess, "Popen", boom)
        assert _start_tensorboard_server(tmp_path) is None
