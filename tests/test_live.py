"""Device-resident live path: depth dewarp + fused live predictor."""

import numpy as np

import jax.numpy as jnp

from recognizer3d_tpu import Model, RandLANetSettings
from recognizer3d_tpu.models.live import (
    DepthIntrinsics,
    LivePredictor,
    depth_to_cloud,
)

TINY = dict(
    n_classes=2, n_points=64, n_neighbors=4, decimation=2,
    layer_sizes=[4, 8, 16, 32], knn="naive",
)


class TestDepthToCloud:
    def test_pinhole_geometry(self):
        intr = DepthIntrinsics(width=4, height=2, fx=2.0, fy=2.0, cx=2.0,
                               cy=1.0, depth_scale=0.001)
        depth = np.full((2, 4), 1000, np.uint16)  # 1 m everywhere
        cloud = np.asarray(depth_to_cloud(jnp.asarray(depth), intr))
        assert cloud.shape == (8, 3)
        np.testing.assert_allclose(cloud[:, 2], 1.0, atol=1e-6)
        # pixel (v=0, u=0): x = (0-2)/2*1 = -1, y = (0-1)/2*1 = -0.5
        np.testing.assert_allclose(cloud[0], [-1.0, -0.5, 1.0], atol=1e-6)

    def test_zero_depth_maps_to_origin(self):
        intr = DepthIntrinsics(width=4, height=2)
        depth = np.zeros((2, 4), np.uint16)
        cloud = np.asarray(depth_to_cloud(jnp.asarray(depth), intr))
        np.testing.assert_allclose(cloud, 0.0)


class TestCloudToDepth:
    def test_roundtrip_inverse_of_dewarp(self):
        """cloud_to_depth is the inverse of the pinhole dewarp: projecting a
        cloud to z16 and dewarping back must recover the points (within the
        quantization of the depth scale + pixel grid)."""
        from recognizer3d_tpu.data.pipeline import cloud_to_depth

        intr = DepthIntrinsics(width=128, height=96, fx=100.0, fy=100.0,
                               cx=64.0, cy=48.0, depth_scale=0.00025)
        rng = np.random.RandomState(0)
        z = rng.uniform(0.2, 0.5, 200).astype(np.float32)
        # keep points well inside the frustum
        x = rng.uniform(-0.25, 0.25, 200).astype(np.float32) * z
        y = rng.uniform(-0.2, 0.2, 200).astype(np.float32) * z
        cloud = np.stack([x, y, z], -1)
        depth = cloud_to_depth(cloud, intr)
        assert depth.shape == (96, 128) and depth.dtype == np.uint16
        back = np.asarray(depth_to_cloud(jnp.asarray(depth), intr))
        back = back[back[:, 2] > 0]
        # points occluded by a nearer point on the same pixel lose the
        # z-buffer (like a real depth sensor); every UNOCCLUDED point must
        # have a reconstruction within the pixel + quantization error
        # (z err <= scale/2; xy err <= z/f per pixel)
        u = np.round(x / z * intr.fx + intr.cx).astype(int)
        v = np.round(y / z * intr.fy + intr.cy).astype(int)
        won = depth[v, u] == np.round(z / intr.depth_scale).astype(np.uint16)
        assert won.mean() > 0.9  # collisions are rare at this density
        d = np.sqrt(
            ((cloud[won][:, None, :] - back[None, :, :]) ** 2).sum(-1).min(1)
        )
        assert d.max() < 3e-3, d.max()

    def test_zbuffer_keeps_nearest(self):
        from recognizer3d_tpu.data.pipeline import cloud_to_depth

        intr = DepthIntrinsics(width=8, height=8, fx=4.0, fy=4.0, cx=4.0,
                               cy=4.0, depth_scale=0.001)
        # two points projecting onto the same pixel; nearer one must win
        cloud = np.array([[0, 0, 0.4], [0, 0, 0.2]], np.float32)
        depth = cloud_to_depth(cloud, intr)
        assert depth[4, 4] == 200  # 0.2 m / 0.001


class TestDepthReplayCamera:
    def test_replay_and_live_predict(self, tmp_path):
        from datetime import datetime

        from recognizer3d_tpu.camera.mock_camera import DepthReplayCamera
        from recognizer3d_tpu.data.dataset import Dataset

        intr = DepthIntrinsics(width=64, height=48, fx=50.0, fy=50.0,
                               cx=32.0, cy=24.0, depth_scale=0.001)
        ds = Dataset(tmp_path / "frames", only_annotated=False)
        rng = np.random.RandomState(0)
        z = rng.uniform(0.2, 0.5, 300).astype(np.float32)
        cloud = np.stack(
            [rng.uniform(-0.2, 0.2, 300).astype(np.float32) * z,
             rng.uniform(-0.15, 0.15, 300).astype(np.float32) * z, z], -1)
        ds[datetime(2026, 3, 1, 9, 0, 0)] = cloud

        cam = DepthReplayCamera("mock-depth", ds, intrinsics=intr)
        cam.start()
        assert cam.depth_intrinsics is intr
        got = cam.get()
        assert got.shape == (300, 3)
        depth = cam.last_depth
        assert depth is not None and depth.shape == (48, 64)
        assert depth.dtype == np.uint16 and (depth > 0).any()

        # the app's depth tick: LivePredictor with the CAMERA's intrinsics
        model = Model(RandLANetSettings(**TINY), seed=0)
        live = LivePredictor(model, n_display=256, intrinsics=intr)
        pts, mask = live.predict_depth(depth)
        assert pts.shape == (256, 3) and mask.dtype == bool
        valid = np.abs(pts).sum(-1) > 0
        assert valid.any()
        # replayed geometry must match the stored cloud (occluded points
        # lose the z-buffer; unmatched display points can only come from
        # pixel-collision artefacts, so the BULK must sit on the cloud)
        d = np.sqrt(
            ((pts[valid][:, None] - cloud[None]) ** 2).sum(-1).min(1)
        )
        assert np.median(d) < 3e-3
        assert (d < 5e-3).mean() > 0.9, d.max()

    def test_auto_connect_env_selects_depth_replay(self, tmp_path, monkeypatch):
        from datetime import datetime

        from recognizer3d_tpu.camera import (
            DepthReplayCamera,
            auto_connect_camera,
        )
        from recognizer3d_tpu.data.dataset import Dataset

        ds = Dataset(tmp_path / "frames", only_annotated=False)
        ds[datetime(2026, 3, 1, 9, 0, 0)] = np.ones((10, 3), np.float32)
        monkeypatch.setenv("RECOGNIZER3D_MOCK_DEPTH", "1")
        cam = auto_connect_camera(mock_data_path=tmp_path / "frames")
        assert isinstance(cam, DepthReplayCamera)
        assert cam.depth_intrinsics is not None


class TestLivePredictor:
    def test_live_frame(self):
        model = Model(RandLANetSettings(**TINY), seed=0)
        intr = DepthIntrinsics(width=64, height=48, fx=50.0, fy=50.0,
                               cx=32.0, cy=24.0, depth_scale=0.001)
        live = LivePredictor(
            model, confidence_threshold=0.5, n_display=512, intrinsics=intr
        )
        # synthetic frame: a 0.3 m plane (inside the z band)
        depth = np.full((48, 64), 300, np.uint16)
        pts, mask = live.predict_depth(depth)
        assert pts.shape == (512, 3)
        assert mask.shape == (512,)
        assert mask.dtype == bool
        valid = np.abs(pts).sum(-1) > 0
        np.testing.assert_allclose(pts[valid][:, 2], 0.3, atol=1e-3)
        # masked points are a subset of valid points
        assert not (mask & ~valid).any()

    def test_out_of_band_frame_yields_empty(self):
        model = Model(RandLANetSettings(**TINY), seed=0)
        intr = DepthIntrinsics(width=64, height=48, depth_scale=0.001)
        live = LivePredictor(model, n_display=512, intrinsics=intr)
        depth = np.full((48, 64), 5000, np.uint16)  # 5 m: outside z band
        pts, mask = live.predict_depth(depth)
        assert not mask.any()

    def test_recall_guard_triggers_on_first_real_frame(self, monkeypatch):
        """The warmup dummy frame must NOT feed the recall guard; the
        first REAL frame must, exactly once (VERDICT r4 #1, live path)."""
        import recognizer3d_tpu.ops.knn as knn_mod

        knn_mod.reset_window_guard()
        calls = []
        monkeypatch.setattr(knn_mod, "window_regime_active", lambda n: True)
        monkeypatch.setattr(
            knn_mod,
            "ensure_window_recall",
            lambda cloud, k, **kw: calls.append(np.shape(cloud)) or {},
        )
        model = Model(
            RandLANetSettings(**{**TINY, "knn": "approximate"}), seed=0
        )
        intr = DepthIntrinsics(width=64, height=48, fx=50.0, fy=50.0,
                               cx=32.0, cy=24.0, depth_scale=0.001)
        live = LivePredictor(model, n_display=512, intrinsics=intr)
        assert calls == []  # warmup (all-zero frame) did not probe
        depth = np.full((48, 64), 300, np.uint16)
        live.predict_depth(depth)
        assert len(calls) == 1  # first real frame probed...
        assert calls[0] == (model.settings.n_points, 3)
        live.predict_depth(depth)
        assert len(calls) == 1  # ...and only once per session
