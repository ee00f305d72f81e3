"""UI layer: Tk + vispy capture/annotate/train/predict widgets (parity with
``/root/reference/ui/__init__.py``).

Imports are lazy (PEP 562) so the package works on headless hosts without
vispy/tkinter — only touching a widget class requires them. The pure
annotation-picking logic is importable unconditionally from
``recognizer3d_tpu.ui.annotation``.
"""

_LAZY = {
    "VispyView": "recognizer3d_tpu.ui.vispy_view",
    "VispyCanvas": "recognizer3d_tpu.ui.vispy_canvas",
    "DataCapturingFrame": "recognizer3d_tpu.ui.data_capturing_frame",
    "PredictionFrame": "recognizer3d_tpu.ui.prediction_frame",
    "TrainFrame": "recognizer3d_tpu.ui.train_frame",
    "Label": "recognizer3d_tpu.ui.label",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(name)
