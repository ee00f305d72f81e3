"""In-memory pyrealsense2 stand-in for contract-testing the RealSense
camera layer without hardware or the SDK (VERDICT r3 #7).

Reproduces exactly the API surface the camera layer touches
(`recognizer3d_tpu/camera/realsense_camera.py`, mirroring
`/root/reference/camera/realsense_camera.py:22-63,90-125`): config /
pipeline / pipeline_wrapper / profile / device / depth sensor / temporal
filter / pointcloud-dewarp / frames, with an L515-shaped synthetic depth
stream (1024x768 z16, pinhole dewarp, depth scale 0.00025 m).

Every call is appended to a ``journal`` list as ``(event, payload)`` so
tests can assert the documented call sequence: stream configuration at
construction, the five depth-sensor options before ``pipeline.start``,
and ``try_wait_for_frames -> temporal_filter.process ->
pointcloud.calculate`` per frame.
"""

import sys
import types

import numpy as np

WIDTH, HEIGHT = 1024, 768
DEPTH_SCALE = 0.00025
FX, FY, PPX, PPY = 640.0, 640.0, 512.0, 384.0


def make_depth(mean_z_m: float, noise_m: float = 0.0, seed: int = 0):
    """A synthetic z16 frame (HEIGHT, WIDTH) uint16 around mean_z_m."""
    rng = np.random.RandomState(seed)
    z = np.full((HEIGHT, WIDTH), mean_z_m)
    if noise_m:
        z = z + rng.randn(HEIGHT, WIDTH) * noise_m
    return np.clip(z / DEPTH_SCALE, 0, 65535).astype(np.uint16)


class _Namespace:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _DepthFrame:
    def __init__(self, data: np.ndarray, filtered: bool = False):
        self.data = data
        self.filtered = filtered

    def get_data(self):
        return self.data


class _Frames:
    def __init__(self, depth_frame):
        self._depth = depth_frame

    def get_depth_frame(self):
        return self._depth


class _TemporalFilter:
    def __init__(self, journal, smoothing, delta, persistence):
        journal.append(
            ("temporal_filter", (smoothing, delta, persistence))
        )
        self._journal = journal

    def process(self, frame):
        self._journal.append(("temporal.process", None))
        return _DepthFrame(frame.data, filtered=True)


class _Points:
    def __init__(self, vertices):
        self._v = vertices

    def get_vertices(self):
        return self._v


class _Pointcloud:
    def __init__(self, journal):
        self._journal = journal

    def calculate(self, depth_frame):
        self._journal.append(
            ("pointcloud.calculate", {"filtered": depth_frame.filtered})
        )
        z = depth_frame.data.astype(np.float32) * DEPTH_SCALE
        u = np.arange(WIDTH, dtype=np.float32)[None, :]
        v = np.arange(HEIGHT, dtype=np.float32)[:, None]
        x = (u - PPX) / FX * z
        y = (v - PPY) / FY * z
        return _Points(
            np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
        )


class _Sensor:
    def __init__(self, journal):
        self._journal = journal

    def set_option(self, option, value):
        self._journal.append(("sensor.set_option", (option, value)))

    def get_depth_scale(self):
        return DEPTH_SCALE


class _Device:
    def __init__(self, journal, product_line, name, serial):
        self._journal = journal
        self._info = {
            "product_line": product_line,
            "name": name,
            "serial_number": serial,
        }

    def get_info(self, key):
        return self._info[key]

    def first_depth_sensor(self):
        return _Sensor(self._journal)


class _Intrinsics:
    width, height = WIDTH, HEIGHT
    fx, fy, ppx, ppy = FX, FY, PPX, PPY


class _VideoStreamProfile:
    def get_intrinsics(self):
        return _Intrinsics()


class _StreamProfile:
    def as_video_stream_profile(self):
        return _VideoStreamProfile()


class _Profile:
    def __init__(self, device):
        self._device = device

    def get_device(self):
        return self._device

    def get_stream(self, stream):
        assert stream == "depth", stream
        return _StreamProfile()


class _Config:
    def __init__(self, journal, device):
        self._journal = journal
        self._device = device
        self.enabled_serial = None
        self.streams = []

    def enable_device(self, serial):
        self.enabled_serial = serial
        self._journal.append(("config.enable_device", serial))

    def enable_stream(self, stream, width, height, fmt, fps):
        self.streams.append((stream, width, height, fmt, fps))
        self._journal.append(
            ("config.enable_stream", (stream, width, height, fmt, fps))
        )

    def resolve(self, pipeline_wrapper):
        self._journal.append(("config.resolve", None))
        return _Profile(self._device)


class _Pipeline:
    def __init__(self, journal, frame_queue):
        self._journal = journal
        self._queue = frame_queue
        self.started_with = None

    def start(self, config):
        self.started_with = config
        self._journal.append(("pipeline.start", config.enabled_serial))

    def stop(self):
        self._journal.append(("pipeline.stop", None))

    def try_wait_for_frames(self, timeout_ms=200):
        self._journal.append(("try_wait_for_frames", timeout_ms))
        if not self._queue:
            return False, None
        return True, _Frames(_DepthFrame(self._queue.pop(0)))


class _Context:
    def __init__(self, devices):
        self._devices = devices

    def query_devices(self):
        return self._devices


def build_rs(journal, frame_queue, product_line="L500",
             device_name="Intel RealSense L515", serial="F0000000"):
    """The ``rs`` module object (what `from pyrealsense2 import
    pyrealsense2 as rs` binds)."""
    device = _Device(journal, product_line, device_name, serial)
    rs = types.ModuleType("pyrealsense2.pyrealsense2")
    rs.config = lambda: _Config(journal, device)
    rs.context = lambda: _Context([device])
    rs.pipeline = lambda context=None: _Pipeline(journal, frame_queue)
    rs.pipeline_wrapper = lambda pipeline: ("wrapper", pipeline)
    rs.temporal_filter = (
        lambda s, d, p: _TemporalFilter(journal, s, d, p)
    )
    rs.pointcloud = lambda: _Pointcloud(journal)
    rs.stream = _Namespace(depth="depth")
    rs.format = _Namespace(z16="z16")
    rs.camera_info = _Namespace(
        product_line="product_line", name="name",
        serial_number="serial_number",
    )
    rs.option = _Namespace(
        min_distance="min_distance", digital_gain="digital_gain",
        laser_power="laser_power", receiver_gain="receiver_gain",
        noise_filtering="noise_filtering",
    )
    rs.sensor = object
    return rs


def install(monkeypatch, frames=None, **kw):
    """Insert the stub as the importable ``pyrealsense2`` package.

    Returns (journal, frame_queue): mutate frame_queue to feed depth
    frames; inspect journal for the recorded call sequence.
    """
    journal = []
    frame_queue = list(frames or [])
    rs = build_rs(journal, frame_queue, **kw)
    pkg = types.ModuleType("pyrealsense2")
    pkg.pyrealsense2 = rs
    monkeypatch.setitem(sys.modules, "pyrealsense2", pkg)
    monkeypatch.setitem(sys.modules, "pyrealsense2.pyrealsense2", rs)
    return journal, frame_queue
