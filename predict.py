"""Prediction CLI + Predictor.

Surface parity with the reference ``predict.py``: ``Predictor`` (model load,
warmup predict because the first call compiles — the reference's
"first prediction is always much slower" comment, predict.py:22-24 — and a
boolean mask from class-1 confidence > threshold, predict.py:26-31), a
blocking per-sample ``visualize()`` (vispy, optional) and the identical
argparse CLI (predict.py:84-125).
"""

from pathlib import Path

import numpy as np

from recognizer3d_tpu import Dataset, DatasetMerged, Model


class Predictor:
    def __init__(
        self, model_path: Path, confidence_threshold: float = 0.5
    ) -> None:
        self._model = Model.load(Path(model_path), use_gpu=True)
        self.confidence_threshold: float = confidence_threshold
        # warmup: triggers jit compilation of the forward program so the
        # live loop's first real frame isn't slow (predict.py:22-24)
        dummy_cloud = np.random.random((30, 3))
        self._model.predict(dummy_cloud)

    def predict(self, point_cloud: np.ndarray) -> np.ndarray:
        confidences_all_classes = self._model.predict(point_cloud)
        confidences = confidences_all_classes[1, :]  # class 0 is background
        return confidences > self.confidence_threshold


def visualize(
    point_cloud: np.ndarray, annotation: np.ndarray, prediction: np.ndarray
) -> bool:
    """Blocking vispy window for one sample; Enter = next, Escape = stop
    (predict.py:34-81). Returns True when the user asked to stop."""
    import vispy
    import vispy.app
    import vispy.scene

    from recognizer3d_tpu.ui import Label, VispyView

    do_break = False
    canvas = vispy.scene.SceneCanvas(
        title="visualization 3D",
        keys="interactive",
        show=True,
        fullscreen=False,
        size=(1000, 600),
        position=(0, 0),
    )

    def process_key(event):
        nonlocal do_break
        if event.key == vispy.keys.ESCAPE:
            do_break = True
            vispy.app.quit()
        elif event.key == vispy.keys.ENTER:
            vispy.app.quit()

    canvas.events.key_press.connect(process_key)

    view = canvas.central_widget.add_view()
    vispy_view = VispyView(view, None)
    vispy_view.point_cloud = point_cloud
    vispy_view.annotation = annotation
    vispy_view.prediction = prediction

    help_text = (
        "red: captured data \n"
        "green: prediction from the model \n"
        "blue: annotation \n"
        "white: overlap of all three above \n"
        "Press enter for next sample. Press escape to stop."
    )
    help_label = Label(
        help_text, color="white", anchor_x="left", anchor_y="bottom"
    )
    canvas.central_widget.add_widget(help_label)
    canvas.show(visible=True)
    vispy.app.run()
    return do_break


if __name__ == "__main__":
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
    args = parser.parse_args()
    project_dir = Path(__file__).absolute().parent

    predictor = Predictor(
        project_dir / args.model, confidence_threshold=args.confidence
    )
    datasets = [
        Dataset(
            project_dir / dataset_name,
            only_annotated=False,
            broaden_annotations=True,
        )
        for dataset_name in args.dataset
    ]
    dataset = DatasetMerged(datasets)

    for point_cloud, features, annotation in dataset:
        prediction = predictor.predict(point_cloud)
        if args.no_viz:
            print(
                f"cloud: {point_cloud.shape[0]} pts, "
                f"predicted positives: {int(prediction.sum())}, "
                f"annotated positives: {int(annotation.sum())}"
            )
            continue
        do_break = visualize(point_cloud, annotation, prediction)
        if do_break:
            break
