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
