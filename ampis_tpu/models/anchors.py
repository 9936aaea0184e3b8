"""Anchor generation (detectron2 DefaultAnchorGenerator semantics).

Reference model dependency (SURVEY.md §2b): sizes (32, 64, 128, 256, 512)
one per FPN level P2-P6, aspect ratios (0.5, 1.0, 2.0), offset 0. Anchor
order within a cell is (size, ratio) nested ratio-innermost; grid order is
row-major — both must match the reference for checkpoint parity of the RPN
head's per-anchor channels.

Everything is a deterministic function of static shapes, so anchors are
baked as numpy constants at trace time (no device compute).
"""
from __future__ import annotations

import numpy as np


def cell_anchors(sizes, aspect_ratios) -> np.ndarray:
    """(len(sizes)*len(ratios), 4) XYXY anchors centered at (0, 0)."""
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ratio in aspect_ratios:
            w = np.sqrt(area / ratio)
            h = w * ratio
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int,
                 cell: np.ndarray, offset: float = 0.0) -> np.ndarray:
    """(feat_h*feat_w*A, 4) anchors for one level, row-major grid order."""
    shift_x = (np.arange(feat_w) + offset) * stride
    shift_y = (np.arange(feat_h) + offset) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).astype(np.float32)
    # (H, W, 1, 4) + (A, 4) -> (H, W, A, 4)
    anchors = shifts[:, :, None, :] + cell[None, None, :, :]
    return anchors.reshape(-1, 4)


def multilevel_anchors(feat_shapes, strides, sizes, aspect_ratios,
                       offset: float = 0.0):
    """Per-level anchor arrays for FPN.

    feat_shapes: list of (h, w); sizes: list of per-level size lists.
    Returns list of (h*w*A, 4) float32 arrays.
    """
    out = []
    for (h, w), stride, level_sizes in zip(feat_shapes, strides, sizes):
        cell = cell_anchors(level_sizes, aspect_ratios)
        out.append(grid_anchors(h, w, stride, cell, offset))
    return out
