"""In-memory tkinter stand-in for driving the Tk layer headlessly
(VERDICT r3 #3 — no display / Xvfb in this environment, so ``tk.Tk()``
cannot open; the widget semantics the app relies on are reimplemented
in-memory and every interaction is scriptable).

Covers what `recognizer3d_tpu/ui/controls.py` and `main.py` touch:
Frame / Label / Entry / Button / Scale / ttk.Progressbar / Tk, with
dict-style option access, ``config("relief")`` introspection,
``after``-scheduling captured into a global queue (``run_scheduled``
fires due callbacks deterministically — the stubbed mainloop), ``bind``
with scriptable ``fire_event``, and Button.invoke().
"""

import sys
import types

#: (delay_ms, callback) in scheduling order — the stubbed event loop
SCHEDULED = []


def run_scheduled(rounds=1):
    """Fire everything currently scheduled via ``after`` (callbacks may
    re-schedule; each round drains only what was queued before it)."""
    for _ in range(rounds):
        due, SCHEDULED[:] = SCHEDULED[:], []
        for _ms, cb in due:
            cb()


class Widget:
    def __init__(self, master=None, **kw):
        self.master = master
        self.children = []
        self._options = dict(kw)
        self._bindings = {}
        self.packed = None
        self.gridded = None
        if master is not None and hasattr(master, "children"):
            master.children.append(self)

    # geometry managers -------------------------------------------------
    def pack(self, **kw):
        self.packed = kw

    def grid(self, **kw):
        self.gridded = kw

    # option access ------------------------------------------------------
    def __setitem__(self, key, value):
        self._options[key] = value

    def __getitem__(self, key):
        return self._options.get(key)

    def config(self, *args, **kw):
        if args:
            key = args[0]
            # tkinter returns a 5-tuple whose last element is the value
            return (key, key, key, None, self._options.get(key))
        self._options.update(kw)

    configure = config

    def cget(self, key):
        return self._options.get(key)

    # events -------------------------------------------------------------
    def bind(self, sequence, callback):
        self._bindings.setdefault(sequence, []).append(callback)

    def fire_event(self, sequence, event=None):
        for cb in self._bindings.get(sequence, []):
            cb(event)

    def after(self, ms, callback=None):
        if callback is not None:
            SCHEDULED.append((ms, callback))

    def destroy(self):
        pass

    def winfo_children(self):
        return self.children


class Frame(Widget):
    pass


class Label(Widget):
    pass


class Entry(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._text = ""

    def get(self):
        return self._text

    def insert(self, index, text):
        self._text += text

    def delete(self, first, last=None):
        self._text = ""

    def set_text(self, text):
        """Test helper: type ``text`` and fire the KeyRelease binding."""
        self._text = text
        self.fire_event("<KeyRelease>")


class Button(Widget):
    def __init__(self, master=None, **kw):
        kw.setdefault("relief", "raised")
        kw.setdefault("state", "normal")
        super().__init__(master, **kw)

    def invoke(self):
        if self._options.get("state") != "disabled":
            command = self._options.get("command")
            if command is not None:
                return command()


class Scale(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._value = kw.get("from_", 0)

    def set(self, value):
        self._value = value
        command = self._options.get("command")
        if command is not None:
            command(str(value))

    def get(self):
        return self._value


class Progressbar(Widget):
    pass


class Tk(Widget):
    def __init__(self):
        super().__init__(None)
        self._title = ""
        self.withdrawn = False
        self.mainloop_calls = 0

    def title(self, text=None):
        if text is not None:
            self._title = text
        return self._title

    def withdraw(self):
        self.withdrawn = True

    def mainloop(self):
        self.mainloop_calls += 1


def install(monkeypatch):
    """Insert the stub as ``tkinter`` + ``tkinter.ttk``; returns the
    module (inspect ``SCHEDULED`` / call ``run_scheduled`` to pump the
    stubbed event loop)."""
    SCHEDULED.clear()
    tk = types.ModuleType("tkinter")
    ttk = types.ModuleType("tkinter.ttk")
    for cls in (Widget, Frame, Label, Entry, Button, Scale, Tk):
        setattr(tk, cls.__name__, cls)
    ttk.Progressbar = Progressbar
    tk.ttk = ttk
    # constants the UI uses
    for const in (
        "LEFT", "RIGHT", "TOP", "BOTTOM", "BOTH", "X", "Y", "EW", "NSEW",
        "HORIZONTAL", "VERTICAL", "END", "NW",
    ):
        setattr(tk, const, const.lower())
    tk.TclError = RuntimeError
    monkeypatch.setitem(sys.modules, "tkinter", tk)
    monkeypatch.setitem(sys.modules, "tkinter.ttk", ttk)
    return tk
