"""Mock camera replaying stored clouds — the fake hardware backend that lets
the whole app run without a sensor (parity with
``/root/reference/camera/mock_camera.py:8-38``; test-strategy role per
SURVEY.md §4)."""

import numpy as np

from recognizer3d_tpu.camera.base_camera import Camera
from recognizer3d_tpu.data.dataset import Dataset


class MockRealsenseCamera(Camera):
    """Cycles round-robin through a Dataset's clouds as fake frames."""

    def __init__(self, name: str, mock_dataset: Dataset):
        super().__init__(name)
        self._mock_dataset = mock_dataset
        if len(self._mock_dataset) == 0:
            raise Exception("Please provide at least 1 mock frame.")
        self._frame_data_index = 0

    def start(self) -> None:
        self._frame_data_index = 0
        super().start()

    def get(self, timeout_ms: int = 200) -> np.ndarray:
        assert timeout_ms >= 0
        cloud, _, _ = self._mock_dataset[self._frame_data_index]
        self._frame_data_index = (self._frame_data_index + 1) % len(
            self._mock_dataset
        )
        self._last_cloud = cloud
        return cloud
