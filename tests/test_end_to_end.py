"""Headless end-to-end flow: the reference app's whole loop
(capture via mock camera → annotate → train → predict → live predict),
with no UI and no sensor — the integration seal over all the layers
(reference main.py:23-136 choreography, SURVEY.md §3.1-§3.4)."""

from datetime import datetime, timedelta
from pathlib import Path

import numpy as np
import pytest

from recognizer3d_tpu.camera import auto_connect_camera
from recognizer3d_tpu.data.dataset import Dataset, DatasetMerged
from recognizer3d_tpu.models.facade import Model
from recognizer3d_tpu.models.settings import RandLANetSettings
from recognizer3d_tpu.training.settings import TrainingSettings

TINY = dict(
    n_classes=2,
    n_points=128,
    n_features=0,
    n_neighbors=4,
    decimation=2,
    layer_sizes=[4, 8, 16, 32],
    knn="naive",
)


@pytest.fixture()
def mock_capture_dir(tmp_path):
    """A small synthetic 'capture source' for the mock camera."""
    src = tmp_path / "source"
    ds = Dataset(src, only_annotated=False)
    rng = np.random.RandomState(0)
    for i in range(3):
        ts = datetime(2026, 2, 1, 9, 0, i)
        cloud = rng.randn(400, 3).astype(np.float32) * 0.05
        cloud[:40] += [0.1, 0.0, 0.2]  # a separable cluster to learn
        ds[ts] = cloud
    return src


def test_capture_annotate_train_predict(mock_capture_dir, tmp_path):
    # 1. capture: auto-connect falls back to the mock camera (no
    #    pyrealsense2 in this image) replaying the source directory
    camera = auto_connect_camera(mock_data_path=mock_capture_dir)
    camera.start()

    capture_dir = tmp_path / "captured"
    captured = Dataset(capture_dir, only_annotated=False)
    t0 = datetime(2026, 2, 1, 10, 0, 0)
    for i in range(3):
        frame = camera.get()
        assert frame.shape[1] == 3
        ts = t0 + timedelta(seconds=i)
        captured[ts] = np.asarray(frame, np.float32)
        # 2. annotate: mark the planted cluster (the UI's picking writes
        #    the same format, main.py:91-97)
        ann = np.zeros(frame.shape[0], np.uint8)
        ann[:40] = 1
        captured.set_annotation(ts, ann)
    camera.stop()

    # 3. train on the captured+annotated data (tiny recipe)
    annotated = Dataset(capture_dir, broaden_annotations=True)
    merged = DatasetMerged([annotated])
    train_ds, val_ds = merged.split(2 / 3)
    model = Model(RandLANetSettings(**TINY), seed=0)
    model.train(
        train_ds,
        val_ds,
        training_settings=TrainingSettings(
            epochs=2, batch_size=2, early_stopping=False
        ),
        log_dir=tmp_path / "log",
        class_names=["background", "fingerpoint"],
    )

    # 4. save + reload + offline predict (the predict.py flow)
    model_path = tmp_path / "model"
    model.save(model_path)
    reloaded = Model.load(model_path)
    cloud, _, labels = annotated[0]
    conf = reloaded.predict(cloud)
    assert conf.shape == (2, cloud.shape[0])
    np.testing.assert_allclose(conf.sum(axis=0), 1.0, atol=1e-3)

    # 5. live predict from a raw depth frame (the main.py 250 ms loop)
    from recognizer3d_tpu.models.live import LivePredictor

    live = LivePredictor(reloaded, n_display=512)
    depth = np.random.RandomState(1).uniform(
        0.1 / 0.00025, 0.55 / 0.00025, (768, 1024)
    ).astype(np.uint16)
    pts, mask = live.predict_depth(depth)
    assert pts.shape == (512, 3) and mask.shape == (512,)
    assert mask.dtype == bool
