"""Sensor layer: auto-detect an Intel RealSense L515, else fall back to the
mock camera replaying recorded frames (parity with
``/root/reference/camera/__init__.py:11-21``). The RealSense SDK import is
optional — on hosts without pyrealsense2 (e.g. the TPU machine) the mock is
used directly."""

import os
from pathlib import Path
from typing import Optional

from recognizer3d_tpu.camera.base_camera import Camera
from recognizer3d_tpu.camera.mock_camera import (
    DepthReplayCamera,
    MockRealsenseCamera,
)
from recognizer3d_tpu.data.dataset import Dataset

#: Searched in order for the mock camera's replay frames when no
#: ``mock_data_path`` is given: an explicit override env var, real L515
#: captures when a reference checkout is present (genuine ~140k-point
#: live frames — the most faithful no-hardware backend), then the repo's
#: generated synthetic fixture (bin/make_mock_data).
MOCK_DATA_SEARCH_PATH = (
    os.environ.get("RECOGNIZER3D_MOCK_DATA"),
    Path("/root/reference/data/mock"),
    Path("data") / "mock",
)


def auto_connect_camera(mock_data_path: Optional[Path] = None) -> Camera:
    """Return a RealsenseCamera when an L515 is attached, else a mock camera
    over ``mock_data_path`` (default: first non-empty entry of
    ``MOCK_DATA_SEARCH_PATH``)."""
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

    candidates = (
        [mock_data_path]
        if mock_data_path is not None
        else [Path(p) for p in MOCK_DATA_SEARCH_PATH if p]
    )
    # RECOGNIZER3D_MOCK_DEPTH=1: replay stored clouds as RAW depth frames
    # so the no-hardware app drives the device-resident depth pipeline,
    # exactly like it would with a physical L515 attached
    mock_cls = (
        DepthReplayCamera
        if os.environ.get("RECOGNIZER3D_MOCK_DEPTH", "") not in ("", "0")
        else MockRealsenseCamera
    )
    for path in candidates:
        dataset = Dataset(path, only_annotated=False)
        if path.is_dir() and len(dataset) > 0:
            return mock_cls("mock", dataset)
    raise Exception(
        f"No mock frames found in any of {[str(c) for c in candidates]}; "
        "generate some with bin/make_mock_data or set RECOGNIZER3D_MOCK_DATA."
    )


__all__ = [
    "Camera",
    "DepthReplayCamera",
    "MockRealsenseCamera",
    "auto_connect_camera",
]
