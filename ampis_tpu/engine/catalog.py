"""Dataset and metadata registries.

Replaces detectron2's DatasetCatalog / MetadataCatalog (used by the
reference at visualize.py:13,152 and notebook cell 13): a process-global
mapping from dataset name -> loader function, and name -> metadata
(thing_classes etc).
"""
from __future__ import annotations

import types


class _DatasetCatalog:
    def __init__(self):
        self._registry = {}

    def register(self, name, func):
        if not callable(func):
            raise TypeError("second argument must be a callable returning "
                            "the dataset's list of data dicts")
        if name in self._registry:
            raise ValueError(f"dataset '{name}' is already registered")
        self._registry[name] = func

    def get(self, name):
        try:
            return self._registry[name]()
        except KeyError:
            raise KeyError(
                f"dataset '{name}' not registered; available: "
                f"{sorted(self._registry)}") from None

    def list(self):
        return sorted(self._registry)

    def remove(self, name):
        self._registry.pop(name, None)

    def clear(self):
        self._registry.clear()

    def __contains__(self, name):
        return name in self._registry


class Metadata(types.SimpleNamespace):
    """Attribute bag with a chained ``set`` (detectron2-style)."""

    def __init__(self, name="", **kwargs):
        super().__init__(name=name, **kwargs)

    def set(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self

    def get(self, key, default=None):
        return getattr(self, key, default)

    def __getitem__(self, key):
        try:
            return getattr(self, key)
        except AttributeError:
            raise KeyError(key) from None

    def __contains__(self, key):
        return hasattr(self, key)


class _MetadataCatalog:
    def __init__(self):
        self._registry = {}

    def get(self, name=""):
        if name not in self._registry:
            self._registry[name] = Metadata(name=name)
        return self._registry[name]

    def list(self):
        return sorted(self._registry)

    def remove(self, name):
        self._registry.pop(name, None)

    def clear(self):
        self._registry.clear()


DatasetCatalog = _DatasetCatalog()
MetadataCatalog = _MetadataCatalog()
