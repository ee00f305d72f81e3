"""vispy text-label widget (parity with ``/root/reference/ui/label.py:5-41``;
used for the predict CLI's help overlay)."""

from vispy.scene import Widget
from vispy.visuals import TextVisual


class Label(Widget):
    def __init__(self, text: str, rotation: float = 0.0, **kwargs) -> None:
        """
        :param text: The label text.
        :param rotation: The rotation of the label.
        """
        self._text_visual = TextVisual(text=text, rotation=rotation, **kwargs)
        self.rotation = rotation
        Widget.__init__(self)
        self.add_subvisual(self._text_visual)
        self._set_pos()

    def on_resize(self, event) -> None:
        self._set_pos()

    def _set_pos(self) -> None:
        self._text_visual.pos = (self.rect.left + 4, 4)

    @property
    def text(self):
        return self._text_visual.text

    @text.setter
    def text(self, t):
        self._text_visual.text = t
