"""Compatibility shims for artifacts written by the reference stack.

The reference pickles its predictions with detectron2 objects inside
(``detectron2.structures.instances.Instances`` — verified against
examples/powder/data/*.pickle, SURVEY.md §2b). This module provides an
unpickler that maps those module paths onto ampis_tpu's own containers so
stored results load without torch or detectron2 installed.
"""
from __future__ import annotations

import io
import pickle

from ..structures import Boxes, Instances

_CLASS_MAP = {
    ("detectron2.structures.instances", "Instances"): Instances,
    ("detectron2.structures.boxes", "Boxes"): Boxes,
}


class ReferenceUnpickler(pickle.Unpickler):
    """Unpickler accepting detectron2/reference class paths."""

    def find_class(self, module, name):
        mapped = _CLASS_MAP.get((module, name))
        if mapped is not None:
            return mapped
        if module.startswith("detectron2"):
            raise pickle.UnpicklingError(
                f"no ampis_tpu mapping for {module}.{name}")
        return super().find_class(module, name)


def reference_unpickle(file_or_bytes):
    """Load a pickle that may contain detectron2 class references."""
    if isinstance(file_or_bytes, (bytes, bytearray)):
        file_or_bytes = io.BytesIO(file_or_bytes)
    return ReferenceUnpickler(file_or_bytes).load()


def load_pickle(path):
    """Load a (possibly reference-written) pickle from disk."""
    with open(path, "rb") as f:
        return reference_unpickle(f)
