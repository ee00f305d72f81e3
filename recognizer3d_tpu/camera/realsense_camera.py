"""Intel RealSense L515 camera backend.

Behavioural parity with ``/root/reference/camera/realsense_camera.py``:
depth stream 1024×768 z16 @ 30 fps, temporal filter (0.33, 100, 0), the same
depth-sensor options, depth-frame → point cloud via the SDK, z-band filter
0.05 < z < 0.6, and the mean-z sanity check that raises
"No valid frame received." on bad frames (realsense_camera.py:47-52,
117-121). The pyrealsense2 import is deferred to construction so the module
imports cleanly on machines without the SDK (the TPU host).

TPU-native note: only the SDK dewarp stays on the host; the downstream
z-filter → subsample → normalize preprocessing for inference is also
available device-resident in ``recognizer3d_tpu.data.pipeline`` (the
BASELINE.json "device-resident preproc" goal), while this class keeps the
simple host path for API parity.
"""

import numpy as np

from recognizer3d_tpu.camera.base_camera import Camera

Z_MIN, Z_MAX = 0.05, 0.6


def _import_rs():
    from pyrealsense2 import pyrealsense2 as rs  # noqa: WPS433

    return rs


class RealsenseCamera(Camera):
    def __init__(self, name: str, device_serial: str):
        super().__init__(name)
        rs = _import_rs()
        self._rs = rs
        self._realsense_config = rs.config()
        self._context = rs.context()
        self._pipeline = rs.pipeline(self._context)
        self._serial = device_serial

        self._realsense_config.enable_device(device_serial)
        self._realsense_config.enable_stream(
            rs.stream.depth, 1024, 768, rs.format.z16, 30
        )
        # smoothing factor / delta / persistence — reference values
        self._temporal_filter = rs.temporal_filter(0.33, 100, 0)
        self._pc_process = rs.pointcloud()

        pipeline_wrapper = rs.pipeline_wrapper(self._pipeline)
        self._pipeline_profile = self._realsense_config.resolve(pipeline_wrapper)
        device = self._pipeline_profile.get_device()
        if str(device.get_info(rs.camera_info.product_line)) != "L500":
            raise Exception("Expected an L515 camera")

    @property
    def serial(self) -> str:
        return self._serial

    @staticmethod
    def _validate_point_cloud(point_cloud: np.ndarray) -> bool:
        """Mean z of non-zero points must stay below 2 m
        (realsense_camera.py:47-52)."""
        non_zeros = point_cloud[~np.all(point_cloud == 0.0, axis=1)]
        return float(np.mean(non_zeros[:, 2])) < 2

    def _configure_device(self) -> None:
        rs = self._rs
        device = self._pipeline_profile.get_device()
        depth_sensor = device.first_depth_sensor()
        depth_sensor.set_option(rs.option.min_distance, 0)
        depth_sensor.set_option(rs.option.digital_gain, 1.0)
        depth_sensor.set_option(rs.option.laser_power, 100)
        depth_sensor.set_option(rs.option.receiver_gain, 9)
        depth_sensor.set_option(rs.option.noise_filtering, 6)

    def start(self) -> None:
        """Start the pipeline (the lidar starts emitting)."""
        if self._running:
            return
        self._configure_device()
        self._pipeline.start(self._realsense_config)
        super().start()

    def stop(self) -> None:
        """Stop all streams (lasers off)."""
        if not self._running:
            return
        self._pipeline.stop()
        super().stop()

    def get(self, timeout_ms: int = 200) -> np.ndarray:
        """Fetch the latest point cloud; raises when no/invalid frame arrives
        within the timeout (realsense_camera.py:90-125)."""
        if not self._running:
            raise Exception("Realsense pipeline is not running.")
        success, frames = self._pipeline.try_wait_for_frames(
            timeout_ms=timeout_ms
        )
        if not success:
            raise Exception("No frame received.")
        depth_frame = frames.get_depth_frame()
        if self._temporal_filter is not None:
            depth_frame = self._temporal_filter.process(depth_frame)
        points_data = self._pc_process.calculate(depth_frame)
        points = (
            np.asanyarray(points_data.get_vertices())
            .view(np.float32)
            .reshape(-1, 3)
        )
        in_band = (points[:, 2] > Z_MIN) & (points[:, 2] < Z_MAX)
        cloud = points[in_band]
        if not self._validate_point_cloud(cloud):
            raise Exception("No valid frame received.")
        self._last_cloud = cloud
        return cloud
