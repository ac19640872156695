"""Tiny name->factory registries for models, tasks, and losses.

The reference hardcodes model choice in per-script ``build_model`` functions
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:74-79);
a registry lets one engine cover the whole zoo.
"""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, Callable] = {}

    def register(self, name: str):
        def deco(fn):
            if name in self._items:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._items[name] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._items:
            raise KeyError(
                f"unknown {self.kind} {name!r}; available: {sorted(self._items)}"
            )
        return self._items[name]

    def names(self):
        return sorted(self._items)

    def __contains__(self, name):
        return name in self._items


MODELS = Registry("model")
TASKS = Registry("task")
LOSSES = Registry("loss")
