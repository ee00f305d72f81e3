"""Sensor layer: auto-detect an Intel RealSense L515, else fall back to the
mock camera replaying ``data/mock`` (parity with
``/root/reference/camera/__init__.py:11-21``). The RealSense SDK import is
optional — on hosts without pyrealsense2 (e.g. the TPU machine) the mock is
used directly."""

from pathlib import Path
from typing import Optional

from recognizer3d_tpu.camera.base_camera import Camera
from recognizer3d_tpu.camera.mock_camera import MockRealsenseCamera
from recognizer3d_tpu.data.dataset import Dataset


def auto_connect_camera(mock_data_path: Optional[Path] = None) -> Camera:
    """Return a RealsenseCamera when an L515 is attached, else a mock camera
    over ``data/mock`` (or ``mock_data_path``)."""
    try:
        from pyrealsense2 import pyrealsense2 as rs

        from recognizer3d_tpu.camera.realsense_camera import RealsenseCamera

        context = rs.context()
        for device in context.query_devices():
            if device.get_info(rs.camera_info.name) == "Intel RealSense L515":
                serial = device.get_info(rs.camera_info.serial_number)
                return RealsenseCamera(serial, serial)
    except ImportError:
        pass

    if mock_data_path is None:
        mock_data_path = Path("data") / "mock"
    return MockRealsenseCamera(
        "mock", Dataset(mock_data_path, only_annotated=False)
    )


__all__ = ["Camera", "MockRealsenseCamera", "auto_connect_camera"]
