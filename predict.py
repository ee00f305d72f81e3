"""Prediction CLI + Predictor.

Behaviour contract with the reference ``predict.py`` (SURVEY.md §2.11,
§3.4): ``Predictor`` loads a model archive, immediately runs a throwaway
prediction (the first call jit-compiles the forward program — "first
prediction is always much slower"), and turns class-1 confidences into a
boolean mask at a threshold; the CLI walks the given datasets showing
each sample in a blocking window (Enter = next, Escape = stop) with red
data / green prediction / blue annotation / white overlap, or prints
stats with ``--no-viz``.
"""

from pathlib import Path

import numpy as np

from recognizer3d_tpu import Dataset, DatasetMerged, Model

_FOREGROUND_CLASS = 1  # class 0 is background


class Predictor:
    """A loaded, warmed-up model producing boolean per-point masks."""

    def __init__(
        self,
        model_path: Path,
        confidence_threshold: float = 0.5,
        transfer_dtype: str = "float16",
        warmup_points: int = 30,
    ) -> None:
        """:param transfer_dtype: upload dtype for full clouds. The live/
        serving surfaces default to float16 — the H2D upload is the dominant
        wall cost per frame and f16's input quantization (~0.3 mm at the
        L515's 0.6 m range cap) sits below the sensor's own 1-2 mm depth
        noise (models/facade.py). Pass "float32" for bit-exact parity runs.
        :param warmup_points: size of the dummy warm-up cloud. The
        predict program is compiled per PADDED-size bucket (facade._bucket),
        so pass a representative frame size when known — the reference's
        30-point default (predict.py:23-24) only compiles the smallest
        bucket, leaving the first real frame to pay its own compile."""
        self.confidence_threshold = float(confidence_threshold)
        self._model = Model.load(
            Path(model_path), use_gpu=True, transfer_dtype=transfer_dtype
        )
        self._warm_up(max(int(warmup_points), 30))

    def _warm_up(self, n_points: int) -> None:
        """Trigger jit compilation so the first real frame isn't slow."""
        self._model.predict_mask(
            np.random.random((n_points, 3)), self.confidence_threshold
        )

    def predict(self, point_cloud: np.ndarray) -> np.ndarray:
        """(N,) bool: foreground confidence above the threshold. Uses the
        device-side threshold path (one bool per point crosses the host
        boundary instead of the (C, N) float confidences)."""
        return self._model.predict_mask(
            point_cloud, self.confidence_threshold
        )


_HELP_TEXT = (
    "red: captured data \n"
    "green: prediction from the model \n"
    "blue: annotation \n"
    "white: overlap of all three above \n"
    "Press enter for next sample. Press escape to stop."
)


def visualize(
    point_cloud: np.ndarray, annotation: np.ndarray, prediction: np.ndarray
) -> bool:
    """Show one sample in a blocking vispy window; returns True when the
    user pressed Escape (stop iterating)."""
    import vispy

    # pin the backend like the reference CLI (predict.py:12) — without it
    # vispy auto-selects (Qt over tk) in multi-toolkit environments
    try:
        vispy.use("tkinter")
    except RuntimeError:
        pass  # a backend is already in use (e.g. embedded in the app)
    import vispy.app
    import vispy.scene

    from recognizer3d_tpu.ui.scene import CloudPanel, TextOverlay

    canvas = vispy.scene.SceneCanvas(
        title="visualization 3D",
        keys="interactive",
        show=True,
        fullscreen=False,
        size=(1000, 600),
        position=(0, 0),
    )
    stop_requested = False

    def on_key(event):
        nonlocal stop_requested
        if event.key == vispy.keys.ESCAPE:
            stop_requested = True
            vispy.app.quit()
        elif event.key == vispy.keys.ENTER:
            vispy.app.quit()

    canvas.events.key_press.connect(on_key)

    panel = CloudPanel(canvas.central_widget.add_view())
    panel.show_cloud(point_cloud)
    panel.set_overlay("annotation", annotation)
    panel.set_overlay("prediction", prediction)
    canvas.central_widget.add_widget(
        TextOverlay(
            _HELP_TEXT, color="white", anchor_x="left", anchor_y="bottom"
        )
    )
    canvas.show(visible=True)
    vispy.app.run()
    return stop_requested


def _cli() -> None:
    from argparse import ArgumentParser

    parser = ArgumentParser(
        "Predictor",
        usage="python3 predict.py -m models/<timestamp> -d data/dataset1",
        description="This script allows visualizing a prediction without a UI."
        "The script will iterate over each sample in the dataset(s) "
        "and visualize it one by one. Press 'enter' to go to the next sample. "
        "Press 'escape' to stop predictions.",
    )
    parser.add_argument(
        "-m",
        "--model",
        required=True,
        help="Select the model which should be used. Path should be relative "
        "to main project directory.",
    )
    parser.add_argument(
        "-d",
        "--dataset",
        nargs="+",
        required=True,
        help="Select one or multiple datasets to predict. "
        "Paths should be relative to main project directory.",
    )
    parser.add_argument(
        "-c",
        "--confidence",
        required=False,
        default=0.5,
        type=float,
        help="Choose which confidence threshold to use. default value is 0.5",
    )
    parser.add_argument(
        "--no-viz",
        action="store_true",
        help="Skip the vispy visualization (print prediction stats instead).",
    )
    parser.add_argument(
        "--transfer-dtype",
        choices=("float32", "float16"),
        default="float16",
        help="Upload dtype for full clouds (default float16: halves the "
        "host-to-device bytes per frame; quantization ~0.3 mm at the "
        "sensor's range cap, below its depth noise). Use float32 for "
        "bit-exact parity runs.",
    )
    args = parser.parse_args()
    project_dir = Path(__file__).absolute().parent

    samples = DatasetMerged(
        [
            Dataset(
                project_dir / name,
                only_annotated=False,
                broaden_annotations=True,
            )
            for name in args.dataset
        ]
    )
    predictor = Predictor(
        project_dir / args.model,
        args.confidence,
        args.transfer_dtype,
        # warm the bucket the real clouds will land in, not just the
        # 30-point minimum (compiles are per padded-size bucket)
        warmup_points=samples[0][0].shape[0] if len(samples) else 30,
    )
    for point_cloud, _features, annotation in samples:
        prediction = predictor.predict(point_cloud)
        if args.no_viz:
            print(
                f"cloud: {point_cloud.shape[0]} pts, "
                f"predicted positives: {int(prediction.sum())}, "
                f"annotated positives: {int(annotation.sum())}"
            )
        elif visualize(point_cloud, annotation, prediction):
            break


if __name__ == "__main__":
    _cli()
