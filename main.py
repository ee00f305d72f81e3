"""Interactive capture / annotate / train / predict app.

Behaviour contract with the reference app (SURVEY.md §2.11, §3.1): a Tk
window holding the three-panel vispy scene (live, captured+annotatable,
prediction) over a control bar; a 34 ms camera poll loop that refreshes
the live panel and — while Predict is toggled — re-predicts every 250 ms;
Capture writes the current frame into ``data/<name>`` in the reference
on-disk format; every annotation click is stored immediately; Train runs
asynchronously with a progress bar; Escape kills any training job, stops
the camera and exits. Camera/predict errors other than
"No valid frame received." are printed and the loop keeps going.
"""

import sys
import tkinter as tk
from datetime import datetime
from pathlib import Path
from time import monotonic
from traceback import print_exc
from typing import Optional

import vispy

from recognizer3d_tpu import Dataset
from recognizer3d_tpu.camera import auto_connect_camera
from recognizer3d_tpu.ui.controls import AppActions, ControlBar
from recognizer3d_tpu.ui.scene import build_triptych
from predict import Predictor
from train import MODELS_DIR, TrainingJob

vispy.use("tkinter")

DATA_DIR = Path("data")
POLL_MS = 34  # ~29 fps live view
PREDICT_EVERY_S = 0.250


class App:
    """Owns the window, the camera, and the predict/train lifecycles."""

    def __init__(self, window: tk.Tk):
        MODELS_DIR.mkdir(parents=True, exist_ok=True)
        self.window = window
        window.title("3D gesture capturing")

        self._predictor: Optional[Predictor] = None
        self._live_predictor = None  # device-resident depth path (models/live)
        self._next_prediction_due = monotonic()
        self._capture_timestamp = datetime.now()

        frame = tk.Frame()
        self.scene = build_triptych(frame, self._annotation_changed)
        self.scene.canvas.native.pack(
            side=tk.TOP, anchor="nw", fill=tk.BOTH, expand=True
        )
        # ControlBar's constructor refreshes the sample counter, which
        # calls back into _dataset() before the assignment below lands —
        # _dataset guards on this None (bug caught by the headless UI
        # suite, tests/test_ui_headless.py)
        self.controls: Optional[ControlBar] = None
        self.controls = ControlBar(
            frame,
            AppActions(
                capture=self._capture,
                count_samples=lambda: len(self._dataset()),
                start_training=self._start_training,
                toggle_predict=self._toggle_predict,
                set_confidence=self._set_confidence,
            ),
            MODELS_DIR,
        )
        self.controls.pack(side=tk.BOTTOM)
        frame.pack(fill=tk.BOTH, expand=True)

        self.camera = auto_connect_camera()
        self.camera.start()

        window.bind("<Escape>", self._quit)
        window.after(POLL_MS, self._tick)

    # -- the poll loop -------------------------------------------------

    def _tick(self) -> None:
        try:
            cloud = self.camera.get()
            self.scene.live.show_cloud(cloud)
            predicting = (
                self._predictor is not None
                or self._live_predictor is not None
            )
            if predicting and monotonic() >= self._next_prediction_due:
                depth = self.camera.last_depth
                if self._live_predictor is not None and depth is not None:
                    # device-resident path: upload the RAW z16 frame (8×
                    # smaller than the dewarped cloud); dewarp → filter →
                    # subsample → forward → upsample → mask is ONE program
                    shown, mask = self._live_predictor.predict_depth(depth)
                else:
                    shown, mask = cloud, self._predictor.predict(cloud)
                self.scene.prediction.show_cloud(shown)
                self.scene.prediction.set_overlay("prediction", mask)
                self._next_prediction_due = monotonic() + PREDICT_EVERY_S
        except Exception as error:
            # self-healing: bad frames are expected; anything else is
            # printed and the loop keeps polling
            if str(error) != "No valid frame received.":
                print_exc()
        self.window.after(POLL_MS, self._tick)

    # -- capture & annotation ------------------------------------------

    def _dataset(self) -> Dataset:
        name = "" if self.controls is None else self.controls.dataset_name
        return Dataset(DATA_DIR / name)

    def _capture(self) -> None:
        cloud = self.camera.last_cloud
        self._capture_timestamp = datetime.now()
        self.scene.captured.show_cloud(cloud)
        self._dataset()[self._capture_timestamp] = cloud

    def _annotation_changed(self, mask) -> None:
        self._dataset().set_annotation(self._capture_timestamp, mask)

    # -- training ------------------------------------------------------

    def _start_training(self) -> TrainingJob:
        return TrainingJob.launch([DATA_DIR / self.controls.dataset_name])

    # -- prediction ----------------------------------------------------

    def _toggle_predict(self, enable: bool) -> bool:
        if not enable:
            self._predictor = None
            self._live_predictor = None
            return True
        model_name = self.controls.model_name
        if model_name == "":
            print("No model loaded yet. First train a model.")
            return False
        intrinsics = self.camera.depth_intrinsics
        if intrinsics is not None:
            # the camera provides raw depth: run the fused device-resident
            # live pipeline with the DEVICE's calibration (models/live.py;
            # cloud-only cameras fall back to the full-cloud Predictor)
            from recognizer3d_tpu import Model
            from recognizer3d_tpu.models.live import LivePredictor

            self._live_predictor = LivePredictor(
                Model.load(MODELS_DIR / model_name),
                self.controls.confidence,
                intrinsics=intrinsics,
            )
        else:
            self._predictor = Predictor(
                MODELS_DIR / model_name,
                self.controls.confidence,
                # warm the padded-size bucket live frames actually land in
                # (empty before the first frame -> Predictor's 30-pt minimum)
                warmup_points=self.camera.last_cloud.shape[0],
            )
        return True

    def _set_confidence(self, value: float) -> None:
        if self._predictor is not None:
            self._predictor.confidence_threshold = value
        if self._live_predictor is not None:
            self._live_predictor.confidence_threshold = value

    # -- shutdown ------------------------------------------------------

    def _quit(self, _event) -> None:
        job = self.controls.training_job
        if job is not None:
            job.kill()
        self.camera.stop()
        self.window.withdraw()
        sys.exit()


if __name__ == "__main__":
    root = tk.Tk()
    app = App(root)
    root.mainloop()
