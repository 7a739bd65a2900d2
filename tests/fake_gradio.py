"""Minimal gradio stand-in so ``tbist_tpu.ui.gradio_app.build_demo`` can
EXECUTE headlessly (gradio is not installed in this environment).

Installed into ``sys.modules['gradio']`` by tests/test_gradio_ui.py before
the import. Records every constructed widget (with its constructor args)
and every registered event (``.change``/``.click``/``.input``/``.upload``)
so tests can assert widget parity with the reference Blocks app
(reference app.py:889-981) and fire every callback once.

Not a gradio reimplementation: just enough surface for build_demo's usage.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional


class _Ctx:
    blocks: Optional["Blocks"] = None


@dataclasses.dataclass
class Event:
    kind: str
    source: "Component"
    fn: Callable
    inputs: List["Component"]
    outputs: List["Component"]


def _as_list(x) -> list:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


class Component:
    """Base widget: records args, carries a mutable ``value``."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        self.value = kwargs.get("value", self._default_value())
        if _Ctx.blocks is not None:
            _Ctx.blocks.components.append(self)

    def _default_value(self):
        return None

    def _register(self, kind, fn, inputs=None, outputs=None):
        assert _Ctx.blocks is not None, "event registered outside Blocks"
        _Ctx.blocks.events.append(
            Event(kind, self, fn, _as_list(inputs), _as_list(outputs))
        )
        return self

    def change(self, fn, inputs=None, outputs=None, **kw):
        return self._register("change", fn, inputs, outputs)

    def click(self, fn, inputs=None, outputs=None, **kw):
        return self._register("click", fn, inputs, outputs)

    def input(self, fn, inputs=None, outputs=None, **kw):
        return self._register("input", fn, inputs, outputs)

    def upload(self, fn, inputs=None, outputs=None, **kw):
        return self._register("upload", fn, inputs, outputs)

    # context-manager support (Group/Row/Column are plain Components here)
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Blocks(Component):
    def __init__(self, *args, **kwargs):
        self.components: List[Component] = []
        self.events: List[Event] = []
        super().__init__(*args, **kwargs)

    def __enter__(self):
        self._prev = _Ctx.blocks
        _Ctx.blocks = self
        return self

    def __exit__(self, *exc):
        _Ctx.blocks = self._prev
        return False

    def launch(self, **kw):  # never called in tests; here for API shape
        raise RuntimeError("fake gradio cannot launch a server")

    # --- test helpers ---
    def find(self, label: str) -> Component:
        hits = [c for c in self.components if c.label == label]
        assert len(hits) == 1, f"label {label!r}: {len(hits)} matches"
        return hits[0]

    def events_for(self, source: Component) -> List[Event]:
        return [e for e in self.events if e.source is source]


class Row(Component):
    pass


class Column(Component):
    pass


class Group(Component):
    pass


class Markdown(Component):
    pass


class Radio(Component):
    def __init__(self, choices=None, **kwargs):
        self.choices = list(choices) if choices else []
        super().__init__(choices, **kwargs)


class CheckboxGroup(Component):
    def __init__(self, choices=None, **kwargs):
        self.choices = list(choices) if choices else []
        super().__init__(choices, **kwargs)

    def _default_value(self):
        return []


class Dropdown(Component):
    def __init__(self, choices=None, **kwargs):
        self.choices = list(choices) if choices is not None else []
        super().__init__(**kwargs)


class Textbox(Component):
    def _default_value(self):
        return ""


class Checkbox(Component):
    def _default_value(self):
        return False


class Slider(Component):
    def __init__(self, minimum=0, maximum=100, value=None, **kwargs):
        self.minimum = kwargs.pop("minimum", minimum)
        self.maximum = kwargs.pop("maximum", maximum)
        self.step = kwargs.get("step")
        if value is None:
            value = kwargs.get("value", self.minimum)
        kwargs["value"] = value
        super().__init__(**kwargs)


class Image(Component):
    pass


class Video(Component):
    pass


class Gallery(Component):
    pass


class Button(Component):
    def __init__(self, value="Run", **kwargs):
        super().__init__(value=value, **kwargs)


def update(**kwargs) -> dict:
    return {"__type__": "update", **kwargs}


def fire(event: Event, values: Optional[dict] = None) -> Any:
    """Call an event's fn with each input widget's current value
    (overridable via ``values`` keyed by widget), then write results back
    to the output widgets — the loop gradio's server would run."""
    values = values or {}
    args = [values.get(w, w.value) for w in event.inputs]
    result = event.fn(*args)
    outs = event.outputs
    if outs:
        results = result if isinstance(result, tuple) else (result,)
        assert len(results) == len(outs), (
            f"{event.fn.__name__}: returned {len(results)} values for "
            f"{len(outs)} outputs"
        )
        for w, r in zip(outs, results):
            if not (isinstance(r, dict) and r.get("__type__") == "update"):
                w.value = r
    return result
