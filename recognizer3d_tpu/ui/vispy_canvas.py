"""Three-view vispy canvas embedded in Tk: live / captured(annotatable) /
prediction, with linked cameras (parity with
``/root/reference/ui/vispy_canvas.py:18-52``)."""

import tkinter as tk

import numpy as np
import vispy.scene

from recognizer3d_tpu.ui.vispy_view import VispyView


class VispyCanvas(tk.Frame):
    """Visualizes point clouds in 3 linked views: live capture, annotation
    and prediction."""

    def __init__(self, parent, store_callback):
        super().__init__(parent, height=200, width=400)
        self.pack_propagate(False)
        self._store_callback = store_callback

        self._canvas = vispy.scene.SceneCanvas(
            title="visualization 3D",
            keys="interactive",
            show=True,
            fullscreen=False,
            size=(200, 600),
            position=(0, 0),
            parent=self,
        )
        self._canvas.native.pack(
            side=tk.LEFT, anchor="nw", fill=tk.BOTH, expand=True
        )
        grid = self._canvas.central_widget.add_grid()
        border = (0.5, 0.5, 0.5, 1)
        zero_offset = np.array([0, 0, 0])

        self.live_view = VispyView(
            grid.add_view(border_color=border, row=0, col=0),
            store_callback,
            offset=zero_offset,
        )
        self.captured_view = VispyView(
            grid.add_view(border_color=border, row=0, col=1),
            store_callback,
            allow_annotation=True,
            offset=zero_offset,
        )
        self.prediction_view = VispyView(
            grid.add_view(border_color=border, row=0, col=2),
            store_callback,
            offset=zero_offset,
        )
        # rotating one view rotates all three
        self.live_view.view.camera.link(self.captured_view.view.camera)
        self.live_view.view.camera.link(self.prediction_view.view.camera)
