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
