"""In-memory vispy stand-in so the UI layer EXECUTES in the suite
(VERDICT r3 #3 — vispy is not installable in this environment, so the
rendering layer gets the same stub treatment as pyrealsense2: a faithful
API-surface fake that records every call).

Covers exactly what `recognizer3d_tpu/ui/scene.py`, `predict.py`'s
visualize path and `main.py` touch: SceneCanvas / grid / ViewBox /
Markers / Node / Widget / TextVisual / ArcballCamera / Quaternion /
vispy.use / vispy.app.run. ``Markers.set_data`` keeps the pushed arrays
so tests can assert what would be drawn; ``ViewBox.events.mouse_press``
is a real emitter tests can fire with synthetic events;
``ViewBox.scene.transform.imap`` is the identity on 4-vectors, giving a
well-defined screen->world ray for picking tests.
"""

import sys
import types

import numpy as np


class _Emitter:
    def __init__(self):
        self.callbacks = []

    def connect(self, cb):
        self.callbacks.append(cb)

    def fire(self, event):
        for cb in list(self.callbacks):
            cb(event)


class _Namespace:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class Node:
    def __init__(self, name=None, parent=None):
        self.name = name
        self.parent = parent
        self.children = []
        if parent is not None:
            parent.children.append(self)


class Markers(Node):
    def __init__(self, parent=None, scaling=False, **kw):
        super().__init__(name="markers", parent=parent)
        self.scaling = scaling
        self.visible = True
        self.gl_state = None
        self.data = {}

    def set_gl_state(self, *args, **kw):
        self.gl_state = (args, kw)

    def set_data(self, **kw):
        self.data = kw


class TextVisual:
    def __init__(self, text="", **kw):
        self.text = text
        self.kwargs = kw
        self.pos = (0, 0)


class Widget(Node):
    def __init__(self, *args, **kw):
        super().__init__(name="widget")
        self.subvisuals = []
        self.rect = _Namespace(left=0.0, bottom=0.0)

    def add_subvisual(self, visual):
        self.subvisuals.append(visual)


class ArcballCamera:
    def __init__(self, fov=60.0, **kw):
        self.fov = fov
        self._quaternion = None
        self.depth_value = 1e5
        self.linked = []
        self.view_changed_calls = 0

    def view_changed(self):
        self.view_changed_calls += 1

    def link(self, other):
        self.linked.append(other)
        other.linked.append(self)


class Quaternion:
    def __init__(self, w=1.0, x=0.0, y=0.0, z=0.0):
        self.w, self.x, self.y, self.z = w, x, y, z


class _Transform:
    @staticmethod
    def imap(vec):
        v = np.asarray(vec, dtype=np.float64)
        if v.shape[-1] == 4 and v[3] == 0.0:
            v = v.copy()
            v[3] = 1.0
        return v


class ViewBox(Node):
    def __init__(self, **kw):
        super().__init__(name="viewbox")
        self.kwargs = kw
        self.camera = None
        self.events = _Namespace(
            mouse_press=_Emitter(), mouse_move=_Emitter(),
            key_press=_Emitter(),
        )
        self.scene = _Namespace(transform=_Transform())

    def add(self, node):
        self.children.append(node)
        node.parent = self


class _Grid:
    def __init__(self):
        self.views = []

    def add_view(self, **kw):
        vb = ViewBox(**kw)
        self.views.append((kw, vb))
        return vb

    def add_widget(self, widget, **kw):
        self.views.append((kw, widget))
        return widget


class _CentralWidget:
    def __init__(self):
        self.grids = []

    def add_grid(self):
        g = _Grid()
        self.grids.append(g)
        return g

    def add_view(self, **kw):
        if not self.grids:
            self.add_grid()
        return self.grids[0].add_view(**kw)

    def add_widget(self, widget, **kw):
        if not self.grids:
            self.add_grid()
        return self.grids[0].add_widget(widget, **kw)


class _Native:
    def __init__(self):
        self.packed = None

    def pack(self, **kw):
        self.packed = kw

    def destroy(self):
        pass


class SceneCanvas:
    instances = []

    def __init__(self, **kw):
        self.kwargs = kw
        self.central_widget = _CentralWidget()
        self.native = _Native()
        self.events = _Namespace(key_press=_Emitter())
        self.closed = False
        SceneCanvas.instances.append(self)

    def show(self, visible=True):
        pass

    def close(self):
        self.closed = True


def make_mouse_press(x, y, button=3):
    """A synthetic vispy mouse event at canvas position (x, y)."""
    return _Namespace(
        pos=np.array([x, y, 0.0, 1.0]), button=button, handled=False
    )


def install(monkeypatch):
    """Insert the stub as the importable ``vispy`` package tree."""
    SceneCanvas.instances = []  # fresh per-install (tests read [-1])
    vispy = types.ModuleType("vispy")
    scene = types.ModuleType("vispy.scene")
    node = types.ModuleType("vispy.scene.node")
    util = types.ModuleType("vispy.util")
    quaternion = types.ModuleType("vispy.util.quaternion")
    visuals = types.ModuleType("vispy.visuals")
    app = types.ModuleType("vispy.app")

    node.Node = Node
    scene.SceneCanvas = SceneCanvas
    scene.Markers = Markers
    scene.Widget = Widget
    scene.ArcballCamera = ArcballCamera
    scene.node = node
    quaternion.Quaternion = Quaternion
    util.quaternion = quaternion
    visuals.TextVisual = TextVisual
    app.run = lambda: None
    app.quit = lambda: None

    vispy.scene = scene
    vispy.util = util
    vispy.visuals = visuals
    vispy.app = app
    vispy.used = []
    vispy.use = lambda backend=None, **kw: vispy.used.append(backend)
    vispy.keys = _Namespace(ESCAPE="Escape", ENTER="Enter")

    for name, mod in [
        ("vispy", vispy),
        ("vispy.scene", scene),
        ("vispy.scene.node", node),
        ("vispy.util", util),
        ("vispy.util.quaternion", quaternion),
        ("vispy.visuals", visuals),
        ("vispy.app", app),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return vispy
