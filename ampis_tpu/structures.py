"""Data structures for masks and per-image instance collections.

TPU-native re-implementation of the reference's ampis/structures.py (774 LoC)
plus the small slice of detectron2's structure containers that the reference
leans on (``Instances, Boxes, BitMasks, PolygonMasks, BoxMode`` — reference
structures.py:19).  Everything here is numpy-backed host-side bookkeeping;
device work happens in ampis_tpu.models / ampis_tpu.ops.

Public API preserved from the reference so user notebooks run unchanged:
``RLEMasks`` (structures.py:24-95), ``InstanceSet`` (structures.py:98-533),
``mask_areas`` (:536), ``boxes_to_array`` (:613), ``masks_to_rle`` (:643),
``masks_to_bitmask_array`` (:717).

Known reference bugs intentionally fixed (SURVEY.md §2c): dead
``np.bool/np.int`` aliases, ``raise("invalid indices")`` raising a string,
and the undefined-``masks`` fallthrough for non-bool ndarray segmentations.
"""
from __future__ import annotations

import copy
from enum import IntEnum
from pathlib import Path
from typing import List, Union

import numpy as np
import pandas as pd

from . import rle as RLE


# ---------------------------------------------------------------------------
# detectron2-compatible containers (the slice the reference exercises)
# ---------------------------------------------------------------------------

class BoxMode(IntEnum):
    """Bounding-box coordinate conventions (detectron2-compatible values)."""
    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box, from_mode: "BoxMode", to_mode: "BoxMode"):
        box = np.asarray(box, dtype=np.float64)
        if from_mode == to_mode:
            return box
        single = box.ndim == 1
        b = box.reshape(-1, box.shape[-1]).copy()
        if from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYXY_ABS:
            b[:, 2] += b[:, 0]
            b[:, 3] += b[:, 1]
        elif from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            b[:, 2] -= b[:, 0]
            b[:, 3] -= b[:, 1]
        else:
            raise NotImplementedError(
                f"conversion {from_mode} -> {to_mode} not supported")
        return b[0] if single else b


class _ArrayShim(np.ndarray):
    """ndarray subclass with torch-tensor-style ``.to()``/``.numpy()``/``.cpu()``.

    The reference's user-facing code calls ``boxes.tensor.to('cpu').numpy()``
    (e.g. structures.py:639); exposing numpy arrays through this shim keeps
    that idiom working without torch.
    """

    def to(self, *_args, **_kwargs):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return np.asarray(self)


def _as_shim(a: np.ndarray) -> _ArrayShim:
    return np.asarray(a).view(_ArrayShim)


class Boxes:
    """N x 4 boxes in XYXY_ABS, numpy-backed (detectron2 Boxes-compatible)."""

    def __init__(self, tensor):
        arr = np.asarray(getattr(tensor, "tensor", tensor), dtype=np.float32)
        if arr.ndim == 1:
            arr = arr.reshape(-1, 4)
        self.tensor = _as_shim(arr)

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item):
        return Boxes(np.asarray(self.tensor)[item])

    def area(self):
        t = np.asarray(self.tensor)
        return (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])

    def numpy(self):
        return np.asarray(self.tensor)

    def __repr__(self):
        return f"Boxes({np.asarray(self.tensor)!r})"


class BitMasks:
    """N x H x W boolean masks (detectron2 BitMasks-compatible subset)."""

    def __init__(self, tensor):
        self.tensor = _as_shim(np.asarray(tensor).astype(bool))

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item):
        arr = np.asarray(self.tensor)
        if isinstance(item, int):
            return BitMasks(arr[item][None])
        sel = _normalize_index(item, len(self))
        return BitMasks(arr[sel])

    @property
    def image_size(self):
        return tuple(self.tensor.shape[1:])


class PolygonMasks:
    """List-of-polygons masks (detectron2 PolygonMasks-compatible subset).

    ``polygons[i]`` is a list of flat [x0, y0, x1, y1, ...] float arrays for
    instance i.
    """

    def __init__(self, polygons):
        norm = []
        for per_instance in polygons:
            if isinstance(per_instance, np.ndarray) and per_instance.ndim == 1:
                per_instance = [per_instance]
            if len(per_instance) and isinstance(
                    per_instance[0], (int, float, np.floating, np.integer)):
                per_instance = [per_instance]
            norm.append(
                [np.asarray(p, dtype=np.float64).reshape(-1)
                 for p in per_instance])
        self.polygons = norm

    def __len__(self):
        return len(self.polygons)

    def __getitem__(self, item):
        if isinstance(item, int):
            return PolygonMasks([self.polygons[item]])
        if isinstance(item, slice):
            return PolygonMasks(self.polygons[item])
        sel = _normalize_index(item, len(self))
        return PolygonMasks([self.polygons[i] for i in sel])

    def __iter__(self):
        return iter(self.polygons)


def _normalize_index(item, n):
    """Convert bool/int array-likes to an integer-index array."""
    arr = np.asarray(item)
    if arr.dtype == bool:
        assert arr.shape[0] == n, "boolean index length mismatch"
        return np.flatnonzero(arr)
    return arr.astype(np.int64).reshape(-1)


def _index_field(value, item):
    """Index an Instances field of any supported container type."""
    if isinstance(value, np.ndarray):
        return value[item]
    if isinstance(value, (Boxes, BitMasks, PolygonMasks, RLEMasks)):
        return value[item]
    if isinstance(value, list):
        if isinstance(item, slice):
            return value[item]
        if isinstance(item, int):
            return [value[item]]
        sel = _normalize_index(item, len(value))
        return [value[i] for i in sel]
    try:
        return value[item]
    except TypeError:
        return value


class Instances:
    """Per-image instance container with arbitrary named fields.

    Compatible with the subset of detectron2's Instances the reference uses
    (construction with **fields, attribute access, ``has``, fancy indexing,
    ``_fields``), and unpickles the reference's stored predictions via
    ampis_tpu.compat (the pickles name detectron2.structures.instances
    .Instances; SURVEY.md §2b).
    """

    def __init__(self, image_size=(0, 0), **kwargs):
        object.__setattr__(self, "_image_size", tuple(image_size))
        object.__setattr__(self, "_fields", {})
        for k, v in kwargs.items():
            self.set(k, v)

    @property
    def image_size(self):
        return self._image_size

    def set(self, name, value):
        self._fields[name] = value

    def get(self, name):
        return self._fields[name]

    def has(self, name):
        return name in self._fields

    def remove(self, name):
        del self._fields[name]

    def get_fields(self):
        return self._fields

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self.set(name, value)

    def __getattr__(self, name):
        if name.startswith("_") or name not in self.__dict__.get("_fields", {}):
            raise AttributeError(
                f"Instances has no field '{name}'")
        return self._fields[name]

    def __len__(self):
        for v in self._fields.values():
            try:
                return len(v)
            except TypeError:
                continue
        return 0

    def __getitem__(self, item):
        out = Instances(self._image_size)
        for k, v in self._fields.items():
            out.set(k, _index_field(v, item))
        return out

    def to(self, *_args, **_kwargs):
        return self

    def __repr__(self):
        return (f"Instances(num_instances={len(self)}, "
                f"image_size={self._image_size}, "
                f"fields={list(self._fields)})")


class SoftMasks:
    """Lazy full-resolution masks: (N, 28, 28) soft masks + boxes.

    The TPU predictor returns these instead of materialized N x H x W
    bitmasks (which the reference pays for at data_utils.py:275): pasting +
    thresholding + RLE encoding happen fused in multithreaded C++
    (ampis_tpu.rle.paste_masks_to_rle) only when masks are consumed.
    Indexing/len work like a mask container; ``numpy()`` / iteration
    materialize dense bool masks on demand.
    """

    def __init__(self, masks, boxes, image_size, threshold=0.5):
        self.masks = np.asarray(masks, np.float32)
        self.boxes = np.asarray(boxes, np.float32)
        self.image_size = tuple(int(s) for s in image_size)
        self.threshold = float(threshold)
        self._rle = None

    def __len__(self):
        return self.masks.shape[0]

    def __getitem__(self, item):
        if isinstance(item, int):
            item = [item]
        sel = item if isinstance(item, slice) else _normalize_index(
            item, len(self))
        return SoftMasks(self.masks[sel], self.boxes[sel], self.image_size,
                         self.threshold)

    def to_rle(self):
        """Paste + threshold + RLE-encode all masks (cached)."""
        if self._rle is None:
            self._rle = RLE.paste_masks_to_rle(
                self.masks, self.boxes, self.image_size, self.threshold)
        return self._rle

    def numpy(self) -> np.ndarray:
        """(N, H, W) dense boolean masks."""
        rles = self.to_rle()
        if not rles:
            return np.zeros((0,) + self.image_size, bool)
        return RLE.decode(rles).astype(bool).transpose(2, 0, 1)

    def __iter__(self):
        return iter(self.numpy())

    @property
    def tensor(self):
        return self.numpy()


# ---------------------------------------------------------------------------
# RLEMasks (reference structures.py:24-95)
# ---------------------------------------------------------------------------

class RLEMasks:
    """List of RLE mask dicts with fancy indexing.

    Reference: structures.py:24-95. Supports int, slice, integer/bool arrays,
    lists, and tensors so RLE masks can live inside an Instances object.
    """

    def __init__(self, rle):
        self.rle = rle

    def __getitem__(self, item: Union[int, slice, List[int], List[bool],
                                      np.ndarray]):
        if isinstance(item, int):
            # reference behavior: single int returns RLEMasks wrapping the
            # bare dict (structures.py:57-58)
            return RLEMasks(self.rle[item])
        if isinstance(item, slice):
            return RLEMasks(self.rle[item])
        if hasattr(item, "numpy"):  # torch-style tensor
            item = item.numpy()
        arr = np.asarray(item)
        if arr.dtype == bool:
            if arr.shape[0] != len(self):
                raise IndexError("boolean index length mismatch")
            return RLEMasks(
                [m for m, b in zip(self.rle, arr) if b])
        try:
            return RLEMasks([self.rle[int(i)] for i in arr.reshape(-1)])
        except (TypeError, ValueError) as e:
            raise IndexError(f"invalid indices: {item!r}") from e

    def __len__(self):
        return len(self.rle)

    def __iter__(self):
        return iter(self.rle)


# ---------------------------------------------------------------------------
# InstanceSet (reference structures.py:98-533)
# ---------------------------------------------------------------------------

class InstanceSet:
    """Organizes the instances (GT or predicted) for a single image.

    Reference: structures.py:98-533. Stores mask format, bbox mode, image
    path, the Instances container, dataset class, pred/gt flag, HFW scale
    metadata, and per-instance display colors.
    """

    def __init__(self, mask_format=None, bbox_mode=None, filepath=None,
                 annotations=None, instances=None, img=None,
                 dataset_class=None, pred_or_gt=None, HFW=None,
                 HFW_units=None, randomstate=None):
        self.mask_format = mask_format
        self.bbox_mode = bbox_mode
        self.img = img
        self.filepath = filepath
        self.dataset_class = dataset_class
        self.pred_or_gt = pred_or_gt
        self.HFW = HFW
        self.HFW_units = HFW_units
        self.rprops = None
        self.instances = instances
        self.annotations = annotations
        if randomstate is None:
            randomstate = np.random.randint(2 ** 31 - 1)
        self.randomstate = randomstate
        self.colors = None

    def read_from_ddict(self, ddict, inplace=True):
        """Load ground-truth annotations from a data dict.

        Reference: structures.py:203-309. The ddict format is produced by
        :func:`ampis_tpu.data_utils.get_ddicts`.
        """
        from . import visualize  # local import (mutual module use)

        self.pred_or_gt = "gt"
        self.filepath = Path(ddict["file_name"])
        self.mask_format = ddict["mask_format"]
        image_size = (ddict["height"], ddict["width"])

        annos = ddict["annotations"]
        class_idx = np.asarray([a["category_id"] for a in annos],
                               dtype=np.int64)
        bbox = np.stack([np.asarray(a["bbox"]) for a in annos])
        segs = [a["segmentation"] for a in annos]
        if isinstance(segs[0], dict):
            masks = RLEMasks(segs)
        elif isinstance(segs[0], np.ndarray) and segs[0].ndim == 2:
            # dense boolean bitmasks
            masks = BitMasks(np.stack([s.astype(bool) for s in segs]))
        else:
            masks = PolygonMasks(segs)

        instances = Instances(image_size, masks=masks, boxes=bbox,
                              class_idx=class_idx)
        self.instances = instances
        self.instances.colors = visualize.random_colors(
            len(instances), self.randomstate)

        self.dataset_class = ddict.get("dataset_class", None)
        HFW = ddict.get("HFW", None)
        HFW_units = None
        if HFW is not None:
            try:
                HFW = float(HFW)
            except ValueError:
                split = HFW.split(" ")
                if len(split) == 2:
                    HFW = float(split[0])
                    HFW_units = split[1]
        self.HFW = HFW
        self.HFW_units = HFW_units

        if not inplace:
            return self

    def read_from_model_out(self, outs, inplace=True):
        """Load predictions formatted by data_utils.format_outputs().

        Reference: structures.py:312-371.
        """
        from . import visualize

        self.pred_or_gt = "pred"
        self.mask_format = "bitmask"
        self.filepath = outs["file_name"]
        split = outs["dataset"].split("_")
        self.dataset_class = split[-1] if len(split) > 1 else outs["dataset"]

        pred = outs["pred"]["instances"]
        instances = Instances(
            pred.image_size,
            masks=RLEMasks(pred.pred_masks),
            boxes=pred.pred_boxes,
            class_idx=pred.pred_classes,
            scores=pred.scores,
        )
        self.instances = instances
        self.instances.colors = visualize.random_colors(
            len(instances), self.randomstate)

        if not inplace:
            return self

    def filter_mask_size(self, min_thresh=100, max_thresh=100000,
                         to_rle=False):
        """Return an Instances with mask areas in (min_thresh, max_thresh).

        Reference: structures.py:374-442.
        """
        masks = self.instances.masks
        if to_rle:
            masks = RLEMasks(masks_to_rle(masks, self.instances.image_size))
        areas = mask_areas(masks)

        inlier_min = (np.ones(areas.shape, bool) if min_thresh is None
                      else areas > min_thresh)
        inlier_max = (np.ones(areas.shape, bool) if max_thresh is None
                      else areas < max_thresh)
        inliers = np.logical_and(inlier_min, inlier_max)

        new_fields = {}
        for key, value in self.instances._fields.items():
            if key == "masks":
                new_fields[key] = _index_field(masks, inliers)
            else:
                new_fields[key] = _index_field(value, inliers)
        return Instances(self.instances.image_size, **new_fields)

    def remove_edge_instances(self, k=1):
        """Drop instances whose masks touch the image border (within k px).

        Reference: structures.py:445-469.
        """
        r, c = self.instances.image_size
        border = np.ones((r, c), dtype=bool)
        border[k:-k, k:-k] = 0
        border = RLE.encode(np.asfortranarray(border.astype(np.uint8)))
        rles = masks_to_rle(self.instances.masks, (r, c))
        inliers = RLE.intersect_areas(border, rles) == 0
        self.instances = self.instances[inliers]

    def compute_rprops(self, keys=None, return_df=False):
        """Region properties of each mask (area, perimeter, etc).

        Reference: structures.py:474-514 — an O(n) python loop over
        skimage.measure.regionprops_table taking ~30 s on the demo set
        (notebook cell 55). This version computes all masks' properties with
        vectorized numpy over per-instance crops (ampis_tpu.utils.regionprops)
        and needs no skimage.
        """
        from .utils import regionprops

        if keys is None:
            keys = ["area", "equivalent_diameter", "major_axis_length",
                    "perimeter", "solidity", "orientation"]
        rles = masks_to_rle(self.instances.masks,
                            self.instances.image_size)
        table = regionprops.regionprops_table(rles, keys)
        df = pd.DataFrame(table)
        df["class_idx"] = np.asarray(self.instances.class_idx)
        self.rprops = df
        if return_df:
            return self.rprops

    def copy(self):
        """Deep copy of the InstanceSet (reference structures.py:516-533)."""
        return copy.deepcopy(self)


# ---------------------------------------------------------------------------
# polymorphic mask / box converters (reference structures.py:536-774)
# ---------------------------------------------------------------------------

def mask_areas(masks):
    """Area in pixels of each mask (reference structures.py:536-583).

    Bitmask areas are pixel counts; polygon areas use the shoelace formula;
    RLE areas come from the codec.
    """
    if isinstance(masks, np.ndarray):
        return masks.sum(axis=(1, 2), dtype=np.uint64)
    if isinstance(masks, PolygonMasks):
        return np.asarray([
            _shoelace_area(coords[0][::2], coords[0][1::2])
            for coords in masks.polygons])
    if isinstance(masks, list) and len(masks) and isinstance(masks[0], dict):
        return RLE.area(masks)
    if isinstance(masks, RLEMasks):
        return RLE.area(masks.rle)
    if isinstance(masks, BitMasks):
        return np.asarray(masks.tensor).sum(axis=(1, 2), dtype=np.uint64)
    if isinstance(masks, Instances):
        return mask_areas(masks.masks)
    if isinstance(masks, InstanceSet):
        return mask_areas(masks.instances)
    if isinstance(masks, list):
        return [mask_areas(x) for x in masks]
    raise NotImplementedError(f"Not implemented for type {type(masks)}")


def _shoelace_area(x, y):
    """Polygon area via the shoelace formula (reference structures.py:586)."""
    return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def boxes_to_array(boxes):
    """Convert box containers to an (n, 4) array (reference structures.py:613)."""
    if isinstance(boxes, np.ndarray):
        return boxes
    if isinstance(boxes, Boxes):
        return boxes.tensor.to("cpu").numpy()
    if isinstance(boxes, list):
        assert len(boxes[0]) == 4
        return np.asarray(boxes)
    if hasattr(boxes, "tensor"):
        return np.asarray(boxes.tensor)
    raise NotImplementedError(f"cannot convert {type(boxes)} to array")


def masks_to_rle(masks, size=None):
    """Convert mask containers to a list of RLE dicts.

    Reference: structures.py:643-690. Polygon masks use the COCO polygon
    rasterizer (frPyObjects) so downstream IoU scores match the reference
    bit-for-bit.
    """
    if isinstance(masks, list):
        if len(masks) == 0:
            return masks
        if isinstance(masks[0], dict):
            return masks
        if isinstance(masks[0], list):
            raise NotImplementedError(
                "nested lists of polygons: wrap in PolygonMasks")
    if isinstance(masks, RLEMasks):
        return masks.rle
    if isinstance(masks, PolygonMasks):
        assert size is not None, "size required for polygon masks"
        return [RLE.frPyObjects(p, *size)[0] for p in masks.polygons]
    if isinstance(masks, BitMasks):
        arr = np.asarray(masks.tensor)
        return RLE.encode(
            np.asfortranarray(arr.transpose(1, 2, 0).astype(np.uint8)))
    if isinstance(masks, np.ndarray):
        if masks.ndim == 2:
            masks = masks[None]
        return RLE.encode(
            np.asfortranarray(masks.transpose(1, 2, 0).astype(np.uint8)))
    if isinstance(masks, InstanceSet):
        return masks_to_rle(masks.instances.masks, masks.instances.image_size)
    if isinstance(masks, Instances):
        return masks_to_rle(masks.masks, masks.image_size)
    raise NotImplementedError(
        f"cannot convert mask type {type(masks)} to RLE")


def _poly2mask(masks, size):
    """Rasterize flat polygon coordinate lists to an (n, h, w) bool array.

    Reference: structures.py:693-715 (via skimage.draw.polygon2mask). Uses
    the same even-odd pixel-center point-in-polygon rule as skimage.
    """
    from .utils.polygons import polygon2mask

    return np.stack([
        polygon2mask(size, np.stack((np.asarray(p[1::2]),
                                     np.asarray(p[0::2])), axis=1))
        for p in masks])


def masks_to_bitmask_array(masks, size=None):
    """Convert mask containers to an (n, h, w) boolean array.

    Reference: structures.py:717-774.
    """
    if isinstance(masks, np.ndarray):
        assert masks.dtype == bool
        return masks
    if isinstance(masks, PolygonMasks):
        assert size is not None
        polygons = [x[0] for x in masks.polygons]
        return _poly2mask(polygons, size)
    if isinstance(masks, BitMasks):
        return np.asarray(masks.tensor)
    if isinstance(masks, list):
        if len(masks) == 0:
            raise ValueError("empty mask list")
        if isinstance(masks[0], dict):
            return RLE.decode(masks).astype(bool).transpose(2, 0, 1)
        if isinstance(masks[0], (list, np.ndarray)):
            assert size is not None
            return _poly2mask(masks, size)
        raise NotImplementedError
    if isinstance(masks, RLEMasks):
        if isinstance(masks.rle, dict):  # single mask wrapped by int index
            return RLE.decode(masks.rle).astype(bool)[None]
        bitmask = RLE.decode(masks.rle).astype(bool)
        if bitmask.ndim == 2:
            return bitmask[None]
        return bitmask.transpose(2, 0, 1)
    if isinstance(masks, InstanceSet):
        return masks_to_bitmask_array(masks.instances.masks,
                                      masks.instances.image_size)
    if isinstance(masks, Instances):
        return masks_to_bitmask_array(masks.masks, masks.image_size)
    raise NotImplementedError(f"cannot convert {type(masks)}")
