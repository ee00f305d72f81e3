"""Fake hardware backend: replays a stored ``Dataset`` as camera frames.

This is the test-strategy linchpin (SURVEY.md §4): the whole app runs
with zero sensor hardware by cycling round-robin through recorded
clouds.
"""

import numpy as np

from recognizer3d_tpu.camera.base_camera import Camera
from recognizer3d_tpu.data.dataset import Dataset


class MockRealsenseCamera(Camera):
    def __init__(self, name: str, mock_dataset: Dataset):
        super().__init__(name)
        if len(mock_dataset) == 0:
            raise Exception("Please provide at least 1 mock frame.")
        self._frames = mock_dataset
        self._cursor = 0

    def start(self) -> None:
        self._cursor = 0
        super().start()

    def get(self, timeout_ms: int = 200) -> np.ndarray:
        assert timeout_ms >= 0
        cloud = self._frames[self._cursor][0]
        self._cursor = (self._cursor + 1) % len(self._frames)
        self._last_cloud = cloud
        return cloud


class DepthReplayCamera(MockRealsenseCamera):
    """Mock camera that also replays RAW z16 DEPTH frames: each stored
    (dewarped) cloud is re-projected through pinhole intrinsics back into a
    depth image (``data.pipeline.cloud_to_depth`` — the inverse of the SDK
    dewarp), so the app's device-resident depth pipeline (models/live.py,
    driven when ``depth_intrinsics`` is not None) is exercisable and
    benchmarkable with zero sensor hardware. Enable app-wide with
    ``RECOGNIZER3D_MOCK_DEPTH=1`` (camera/__init__.py)."""

    def __init__(self, name: str, mock_dataset: Dataset, intrinsics=None):
        super().__init__(name, mock_dataset)
        if intrinsics is None:
            from recognizer3d_tpu.data.pipeline import DepthIntrinsics

            intrinsics = DepthIntrinsics()
        self._intrinsics = intrinsics

    @property
    def depth_intrinsics(self):
        return self._intrinsics

    def get(self, timeout_ms: int = 200) -> np.ndarray:
        from recognizer3d_tpu.data.pipeline import cloud_to_depth

        cloud = super().get(timeout_ms)
        self._last_depth = cloud_to_depth(cloud, self._intrinsics)
        return cloud

    def get_depth(self, timeout_ms: int = 200) -> np.ndarray:
        self.get(timeout_ms)
        return self._last_depth
