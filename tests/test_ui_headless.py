"""Headless execution of the UI/rendering layer against the in-memory
vispy + tkinter stubs (VERDICT r3 #3): every previously-unexecuted path in
`recognizer3d_tpu/ui/scene.py`, `ui/controls.py` and `main.py` runs here —
imports, panel rendering, overlay masks, mouse-press picking, the control
bar's capture/train/predict columns, the App tick loop with the mock
camera, the stubbed Tk mainloop scheduling, and `predict.visualize`.

Reference contracts: /root/reference/ui/vispy_view.py:126-168 (picking),
/root/reference/main.py:71-89 (tick/predict cadence), ui/*_frame.py
(control columns).
"""

import importlib
import sys
from datetime import datetime
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tests import _tk_stub, _vispy_stub

UI_MODULES = [
    "recognizer3d_tpu.ui.scene",
    "recognizer3d_tpu.ui.controls",
    "main",
]


@pytest.fixture()
def ui(monkeypatch):
    """Both stubs installed + UI modules freshly imported against them."""
    for m in UI_MODULES:
        monkeypatch.delitem(sys.modules, m, raising=False)
    vispy = _vispy_stub.install(monkeypatch)
    tk = _tk_stub.install(monkeypatch)
    ns = SimpleNamespace(
        vispy=vispy,
        tk=tk,
        scene=importlib.import_module("recognizer3d_tpu.ui.scene"),
        controls=importlib.import_module("recognizer3d_tpu.ui.controls"),
    )
    yield ns
    for m in UI_MODULES:
        sys.modules.pop(m, None)


def test_import_smoke(ui):
    """The ~550 LoC rendering layer is importable (a typo in scene.py or
    controls.py fails HERE, not on the user's machine)."""
    import main  # noqa: F401  (imports vispy, tkinter, ui.*, predict, train)

    assert "tkinter" in ui.vispy.used  # main.py pins the tk backend
    assert hasattr(sys.modules["main"], "App")


class TestCloudPanel:
    def _panel(self, ui, **kw):
        return ui.scene.CloudPanel(_vispy_stub.ViewBox(), **kw)

    def test_show_cloud_renders_red_base(self, ui):
        panel = self._panel(ui, offset=(0, 0, 0))
        cloud = np.random.RandomState(0).rand(50, 3).astype(np.float32)
        panel.show_cloud(cloud)
        assert panel._base.visible
        assert panel._base.data["face_color"] == "red"
        # display_subsample may permute; compare as a point multiset
        pos = panel._base.data["pos"]
        assert pos.shape == cloud.shape
        np.testing.assert_allclose(
            pos[np.lexsort(pos.T)], cloud[np.lexsort(cloud.T)], rtol=1e-6
        )
        assert panel.cloud is cloud

    def test_display_subsample_caps_at_10k(self, ui):
        panel = self._panel(ui)
        cloud = np.random.RandomState(0).rand(12000, 3).astype(np.float32)
        panel.show_cloud(cloud)
        assert len(panel._base.data["pos"]) <= 10000

    def test_overlays_select_masked_points(self, ui):
        panel = self._panel(ui, offset=(0, 0, 0))
        cloud = np.random.RandomState(0).rand(40, 3).astype(np.float32)
        panel.show_cloud(cloud)
        mask = np.zeros(40, bool)
        mask[[3, 7]] = True
        panel.set_overlay("prediction", mask)
        layer = panel._layers["prediction"]
        assert layer.visible and layer.data["face_color"] == "green"
        np.testing.assert_allclose(layer.data["pos"], cloud[mask])
        panel.set_overlay("prediction", None)
        assert not layer.visible

    def test_new_cloud_clears_annotation(self, ui):
        panel = self._panel(ui, offset=(0, 0, 0))
        cloud = np.random.RandomState(0).rand(20, 3).astype(np.float32)
        panel.show_cloud(cloud)
        panel.set_overlay("annotation", np.ones(20, bool))
        panel.show_cloud(cloud * 2)
        assert panel.get_overlay("annotation") is None

    def test_camera_home_orientation(self, ui):
        panel = self._panel(ui)
        cam = panel._viewbox.camera
        assert cam.fov == 0
        assert (cam._quaternion.w, cam._quaternion.x) == (0.707, 0.707)


class TestPicking:
    """Middle-mouse press -> screen ray -> nearest-point toggle (the stub
    transform is identity, so the ray runs along +z through (x, y))."""

    def _annotatable(self, ui, calls):
        vb = _vispy_stub.ViewBox()
        panel = ui.scene.CloudPanel(
            vb, on_annotation_change=calls.append, offset=(0, 0, 0)
        )
        cloud = np.array(
            [[0.0, 0.0, 0.5], [0.2, 0.0, 0.5], [0.0, 0.2, 0.5]], np.float32
        )
        panel.show_cloud(cloud)
        return vb, panel

    def test_click_adds_then_removes(self, ui):
        calls = []
        vb, panel = self._annotatable(ui, calls)
        vb.events.mouse_press.fire(_vispy_stub.make_mouse_press(0.001, 0.0))
        assert len(calls) == 1
        np.testing.assert_array_equal(calls[0], [True, False, False])
        np.testing.assert_array_equal(
            panel.get_overlay("annotation"), [True, False, False]
        )
        # second click within 0.01 of the annotated point removes it
        vb.events.mouse_press.fire(_vispy_stub.make_mouse_press(0.002, 0.0))
        np.testing.assert_array_equal(calls[1], [False, False, False])

    def test_non_middle_button_ignored(self, ui):
        calls = []
        vb, _ = self._annotatable(ui, calls)
        vb.events.mouse_press.fire(
            _vispy_stub.make_mouse_press(0.0, 0.0, button=1)
        )
        assert calls == []

    def test_click_without_cloud_is_noop(self, ui, capsys):
        calls = []
        vb = _vispy_stub.ViewBox()
        ui.scene.CloudPanel(vb, on_annotation_change=calls.append)
        vb.events.mouse_press.fire(_vispy_stub.make_mouse_press(0.0, 0.0))
        assert calls == []
        assert "No data captured yet." in capsys.readouterr().out


class TestTriptych:
    def test_three_linked_panels(self, ui):
        parent = ui.tk.Frame()
        trip = ui.scene.build_triptych(parent, lambda mask: None)
        assert trip.canvas.kwargs["size"] == (200, 600)
        assert trip.canvas.kwargs["parent"] is parent
        live_cam = trip.live._viewbox.camera
        assert trip.captured._viewbox.camera in live_cam.linked
        assert trip.prediction._viewbox.camera in live_cam.linked
        # only the captured panel is annotatable
        assert trip.captured._viewbox.events.mouse_press.callbacks
        assert not trip.live._viewbox.events.mouse_press.callbacks


class TestTextOverlay:
    def test_text_roundtrip(self, ui):
        overlay = ui.scene.TextOverlay("hello", color="white")
        assert overlay.text == "hello"
        overlay.text = "bye"
        assert overlay.text == "bye"
        overlay.on_resize(None)  # repositions against the stub rect


class _FakeJob:
    def __init__(self, percents):
        self._percents = list(percents)
        self.killed = False

    def poll(self):
        return self._percents.pop(0) if self._percents else 100

    def kill(self):
        self.killed = True


class TestControlBar:
    def _bar(self, ui, tmp_path, record, accept_predict=True):
        actions = ui.controls.AppActions(
            capture=lambda: record.append("capture"),
            count_samples=lambda: len(record),
            start_training=lambda: _FakeJob([42, 100]),
            toggle_predict=lambda enable: (
                record.append(("predict", enable)),
                accept_predict,
            )[1],
            set_confidence=lambda v: record.append(("confidence", v)),
        )
        return ui.controls.ControlBar(
            ui.tk.Frame(), actions, tmp_path / "models"
        )

    def test_capture_and_live_sample_count(self, ui, tmp_path):
        record = []
        bar = self._bar(ui, tmp_path, record)
        bar._dataset_entry.set_text("my_set")
        assert bar.dataset_name == "my_set"
        before = bar._sample_count["text"]
        next(
            b for b in _walk_buttons(bar) if b["text"] == "Capture"
        ).invoke()
        assert "capture" in record
        assert bar._sample_count["text"] == before + 1

    def test_train_poll_cycle(self, ui, tmp_path):
        record = []
        bar = self._bar(ui, tmp_path, record)
        (tmp_path / "models" / "2026_01_01__01").mkdir(parents=True)
        (tmp_path / "models" / "2026_01_02__01").mkdir(parents=True)
        train_btn = next(
            b for b in _walk_buttons(bar) if b["text"] == "Train"
        )
        train_btn.invoke()
        assert train_btn["state"] == "disabled"
        assert bar._progress["value"] == 1
        _tk_stub.run_scheduled()  # first 500 ms poll -> 42%
        assert bar._progress["value"] == 42
        _tk_stub.run_scheduled()  # -> 100%: done
        assert bar._progress["value"] == 100
        assert train_btn["state"] == "normal"
        assert bar.training_job is None
        # newest model by name (timestamps sort chronologically)
        assert bar.model_name == "2026_01_02__01"

    def test_predict_toggle_relief(self, ui, tmp_path):
        record = []
        bar = self._bar(ui, tmp_path, record)
        btn = bar._predict_button
        btn.invoke()
        assert ("predict", True) in record
        assert btn.config("relief")[-1] == "sunken"
        btn.invoke()
        assert ("predict", False) in record
        assert btn.config("relief")[-1] == "raised"

    def test_predict_toggle_rejected(self, ui, tmp_path):
        record = []
        bar = self._bar(ui, tmp_path, record, accept_predict=False)
        bar._predict_button.invoke()
        assert bar._predict_button.config("relief")[-1] == "raised"

    def test_confidence_slider(self, ui, tmp_path):
        record = []
        bar = self._bar(ui, tmp_path, record)
        assert bar.confidence == 0.5  # starts at 0.5
        bar._confidence.set(0.73)
        assert ("confidence", 0.73) in record


def _walk_buttons(widget):
    for child in widget.children:
        if type(child).__name__ == "Button":
            yield child
        yield from _walk_buttons(child)


@pytest.fixture()
def mock_camera_data(tmp_path, monkeypatch):
    """A tiny replayable mock dataset + camera search path pointed at it."""
    import recognizer3d_tpu.camera as camera_pkg
    from recognizer3d_tpu import Dataset

    ds_dir = tmp_path / "mockframes"
    ds = Dataset(ds_dir)
    rng = np.random.RandomState(0)
    for i in range(3):
        ts = datetime(2026, 1, 1, 9, 0, i)
        ds[ts] = rng.rand(200, 3).astype(np.float32) * 0.3
    monkeypatch.setattr(camera_pkg, "MOCK_DATA_SEARCH_PATH", (str(ds_dir),))
    monkeypatch.delenv("RECOGNIZER3D_MOCK_DEPTH", raising=False)
    return ds_dir


class TestApp:
    """One App lifecycle against mock camera + stub Tk + stub vispy: the
    reference main.py contract (34 ms poll, capture, annotate, train,
    predict toggle, Escape) executed end-to-end headlessly."""

    @pytest.fixture()
    def app(self, ui, mock_camera_data, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        main = importlib.import_module("main")
        window = ui.tk.Tk()
        return SimpleNamespace(main=main, window=window,
                               app=main.App(window))

    def test_tick_shows_live_cloud(self, app):
        assert app.window.title() == "3D gesture capturing"
        _tk_stub.run_scheduled()  # the scheduled 34 ms tick
        live = app.app.scene.live
        assert live.cloud is not None and len(live.cloud) == 200
        # tick re-armed itself
        assert _tk_stub.SCHEDULED

    def test_capture_writes_reference_format(self, app, tmp_path):
        _tk_stub.run_scheduled()
        app.app.controls._dataset_entry.set_text("uitest")
        next(
            b
            for b in _walk_buttons(app.app.controls)
            if b["text"] == "Capture"
        ).invoke()
        files = list((tmp_path / "data" / "uitest").glob("*_data.npy"))
        assert len(files) == 1
        assert app.app.scene.captured.cloud is not None

    def test_annotation_click_persists(self, app, tmp_path):
        _tk_stub.run_scheduled()
        app.app.controls._dataset_entry.set_text("uitest")
        next(
            b
            for b in _walk_buttons(app.app.controls)
            if b["text"] == "Capture"
        ).invoke()
        cloud = app.app.scene.captured.cloud
        target = cloud[5]
        app.app.scene.captured._viewbox.events.mouse_press.fire(
            _vispy_stub.make_mouse_press(target[0], target[1])
        )
        anns = list((tmp_path / "data" / "uitest").glob("*_annotation.npy"))
        assert len(anns) == 1
        mask = np.load(anns[0])
        assert mask.sum() >= 1

    def test_predict_toggle_without_model_rejected(self, app, capsys):
        assert app.app._toggle_predict(True) is False
        assert "First train a model" in capsys.readouterr().out

    def test_escape_quits(self, app):
        with pytest.raises(SystemExit):
            app.window.fire_event("<Escape>", None)
        assert app.window.withdrawn
        assert not app.app.camera._running


class TestAppPredictPath:
    """Predict toggled ON with a real (tiny) model archive: the tick's
    predict branch executes through Predictor into the prediction panel."""

    def test_predict_tick(self, ui, mock_camera_data, tmp_path, monkeypatch):
        from recognizer3d_tpu import Model, RandLANetSettings

        monkeypatch.chdir(tmp_path)
        main = importlib.import_module("main")
        tiny = RandLANetSettings(
            n_classes=2, n_points=64, n_features=0, n_neighbors=4,
            decimation=2, layer_sizes=[4, 8], knn="naive",
        )
        model_dir = Path("models") / "2026_02_02__10_00_00_000000000"
        model_dir.parent.mkdir(exist_ok=True)
        Model(tiny, seed=0).save(model_dir)

        window = ui.tk.Tk()
        app = main.App(window)
        app.controls.refresh_model_name()
        assert app.controls.model_name == model_dir.name
        _tk_stub.run_scheduled()  # first tick: live cloud + last_cloud set
        assert app._toggle_predict(True) is True
        app._next_prediction_due = 0.0  # due immediately
        _tk_stub.run_scheduled()
        mask = app.scene.prediction.get_overlay("prediction")
        assert mask is not None and mask.dtype == bool
        assert len(mask) == len(app.scene.prediction.cloud)


class TestVisualize:
    def test_visualize_runs_and_escape_stops(self, ui, monkeypatch):
        monkeypatch.delitem(sys.modules, "predict", raising=False)
        predict = importlib.import_module("predict")
        cloud = np.random.RandomState(0).rand(30, 3).astype(np.float32)
        ann = np.zeros(30, bool)
        ann[0] = True
        pred = np.zeros(30, bool)

        def run_and_press_escape():
            canvas = _vispy_stub.SceneCanvas.instances[-1]
            canvas.events.key_press.fire(SimpleNamespace(key="Escape"))

        monkeypatch.setattr(ui.vispy.app, "run", run_and_press_escape)
        stopped = predict.visualize(cloud, ann, pred)
        assert stopped is True
        sys.modules.pop("predict", None)
