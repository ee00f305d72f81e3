"""Abstract camera interface (parity with
``/root/reference/camera/base_camera.py:4-28``)."""

import numpy as np


class Camera:
    """Base camera: start/stop lifecycle, frame polling, cached last cloud."""

    def __init__(self, name: str):
        self.name = name
        self._running = False
        self._last_cloud = np.array([])

    def start(self) -> None:
        self._running = True

    def stop(self) -> None:
        self._running = False

    @property
    def device_connected(self) -> bool:
        return True

    def get(self, timeout_ms: int = 200) -> np.ndarray:
        """Return the next point cloud (N, 3) float32."""
        raise NotImplementedError()

    @property
    def last_cloud(self) -> np.ndarray:
        return self._last_cloud
