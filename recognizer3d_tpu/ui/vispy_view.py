"""One vispy scene view: base cloud + annotation/prediction overlays.

Interaction contract parity with ``/root/reference/ui/vispy_view.py``:

- base cloud drawn as red markers, display-subsampled to ≤10k points;
- annotation (blue) and prediction (green) overlays are index clouds —
  boolean masks into the base cloud — drawn additively;
- ArcballCamera with fov=0 and a fixed initial quaternion;
- middle-mouse click (button 3 guard) casts a screen ray and toggles the
  nearest point's annotation; every change fires the store callback
  (the picking math lives in recognizer3d_tpu/ui/annotation.py).
"""

from typing import Callable, Optional

import numpy as np
import vispy.scene
from vispy.scene import ArcballCamera
from vispy.util.quaternion import Quaternion

from recognizer3d_tpu.ui.annotation import display_subsample, pick_annotation


class VispyMarkers(vispy.scene.Markers):
    """Markers visual that remembers its full-resolution data and displays a
    ≤10k random subsample."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._data: Optional[np.ndarray] = None

    def set_data(
        self,
        pos: Optional[np.ndarray] = None,
        size: float = 0.01,
        face_color="white",
    ) -> None:
        shown = display_subsample(pos)
        if shown is None:
            shown = np.array([[0.0, 0.0, 0.0]])
        super().set_data(
            pos=shown,
            edge_width=0.0,
            edge_color=None,
            face_color=face_color,
            size=size,
        )
        self.visible = pos is not None
        self._data = pos

    def get_data(self) -> Optional[np.ndarray]:
        return self._data


class IndexedVispyMarkers(VispyMarkers):
    """Overlay markers addressed by a boolean mask into a parent cloud."""

    def __init__(self, marker_parent: VispyMarkers, *args, **kwargs):
        self._marker_parent = marker_parent
        super().__init__(*args, **kwargs)

    def set_data(
        self,
        pos: Optional[np.ndarray] = None,
        size: float = 0.01,
        face_color="white",
    ) -> None:
        if pos is None:
            cloud = None
        else:
            cloud = self._marker_parent.get_data()[pos.astype(bool)]
        super().set_data(cloud, size, face_color)
        self._data = pos


class VispyView:
    def __init__(
        self,
        view,
        store_callback: Optional[Callable[[], None]],
        allow_annotation: bool = False,
        offset: np.ndarray = np.array([0, 0, 0.3]),
    ):
        self.view = view
        self._offset = offset
        self._store_callback = store_callback

        self._root_node = vispy.scene.node.Node(name="Root node")
        self.view.add(self._root_node)
        self._point_cloud = VispyMarkers(parent=self._root_node, scaling=True)
        self._point_cloud.set_gl_state(
            "opaque", depth_test=False, cull_face=False
        )
        self._annotation = self._overlay_cloud()
        self._prediction = self._overlay_cloud()

        self.view.camera = ArcballCamera(fov=0)
        self.view.camera._quaternion = Quaternion(0.707, 0.707, 0.0, 0.0)
        self.view.camera.depth_value = 1.0
        self.view.camera.view_changed()

        if allow_annotation:
            self.view.events.mouse_press.connect(self.viewbox_mouse_event)

    def _overlay_cloud(self) -> IndexedVispyMarkers:
        cloud = IndexedVispyMarkers(
            self._point_cloud, parent=self._root_node, scaling=True
        )
        cloud.set_gl_state("additive")
        return cloud

    @property
    def point_cloud(self) -> VispyMarkers:
        return self._point_cloud

    @point_cloud.setter
    def point_cloud(self, value: np.ndarray) -> None:
        self._point_cloud.set_data(
            value - self._offset, size=0.001, face_color="red"
        )
        self.annotation = None

    @property
    def annotation(self) -> Optional[np.ndarray]:
        return self._annotation.get_data()

    @annotation.setter
    def annotation(self, value: Optional[np.ndarray]) -> None:
        self._annotation.set_data(value, face_color="blue")

    @property
    def prediction(self) -> Optional[np.ndarray]:
        return self._prediction.get_data()

    @prediction.setter
    def prediction(self, value: np.ndarray) -> None:
        self._prediction.set_data(value, face_color="green")

    def viewbox_mouse_event(self, event) -> None:
        """Middle-mouse annotation toggle (reference vispy_view.py:126-168)."""
        if event.button != 3:
            return
        cloud = self._point_cloud.get_data()
        if cloud is None or len(cloud) == 0:
            print("No data captured yet.")
            return

        tform = self.view.scene.transform
        d1 = np.array([0, 0, 1, 0])  # homogeneous screen-space direction
        p1 = tform.imap(event.pos + d1)
        p0 = tform.imap(event.pos)
        assert abs(p1[3] - 1.0) < 1e-5
        assert abs(p0[3] - 1.0) < 1e-5
        _, new_annotation = pick_annotation(
            p0[:3], p1[:3], cloud, self.annotation
        )
        self.annotation = new_annotation
        if self._store_callback is not None:
            self._store_callback()
