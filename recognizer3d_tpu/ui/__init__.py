"""UI layer: the Tk control bar + vispy cloud panels (SURVEY.md §2.10).

Imports are lazy (PEP 562) so the package works on headless hosts
without vispy/tkinter — only touching a widget requires them. The pure
annotation-picking math is importable unconditionally from
``recognizer3d_tpu.ui.annotation``.
"""

_LAZY = {
    "CloudPanel": "recognizer3d_tpu.ui.scene",
    "TextOverlay": "recognizer3d_tpu.ui.scene",
    "Triptych": "recognizer3d_tpu.ui.scene",
    "build_triptych": "recognizer3d_tpu.ui.scene",
    "AppActions": "recognizer3d_tpu.ui.controls",
    "ControlBar": "recognizer3d_tpu.ui.controls",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(name)
