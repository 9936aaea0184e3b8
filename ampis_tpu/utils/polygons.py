"""Polygon rasterization with skimage.draw semantics.

The reference converts polygons to dense masks two different ways:
* polygon -> RLE uses COCO's boundary-crossing rasterizer (handled by
  ampis_tpu.rle.frPyObjects);
* polygon -> bitmask uses skimage.draw.polygon2mask (reference
  structures.py:711-715), an even-odd pixel-center point-in-polygon test.

This module reproduces the second (vectorized numpy PNPOLY over the clipped
bounding box), so both conversion paths keep their reference behavior.
"""
from __future__ import annotations

import numpy as np


def polygon(r, c, shape=None):
    """Row/col indices of pixels inside the polygon (skimage.draw.polygon)."""
    r = np.asarray(r, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    minr = max(0, int(np.floor(r.min())))
    minc = max(0, int(np.floor(c.min())))
    maxr = int(np.ceil(r.max()))
    maxc = int(np.ceil(c.max()))
    if shape is not None:
        maxr = min(shape[0] - 1, maxr)
        maxc = min(shape[1] - 1, maxc)
    if maxr < minr or maxc < minc:
        return (np.empty(0, np.intp), np.empty(0, np.intp))

    rr = np.arange(minr, maxr + 1)
    cc = np.arange(minc, maxc + 1)
    gr = rr[:, None]  # y coordinate of the PNPOLY test
    gc = cc[None, :]  # x coordinate

    inside = np.zeros((rr.size, cc.size), dtype=bool)
    nv = r.size
    j = nv - 1
    for i in range(nv):
        yi, yj = r[i], r[j]
        xi, xj = c[i], c[j]
        cond = ((yi <= gr) & (gr < yj)) | ((yj <= gr) & (gr < yi))
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (gr - yi) / (yj - yi) + xi
        inside ^= cond & (gc < xcross)
        j = i
    ri, ci = np.nonzero(inside)
    return ri + minr, ci + minc


def polygon2mask(image_shape, poly) -> np.ndarray:
    """Boolean mask from an (N, 2) array of (row, col) polygon vertices."""
    poly = np.asarray(poly, dtype=np.float64)
    mask = np.zeros(image_shape, dtype=bool)
    rr, cc = polygon(poly[:, 0], poly[:, 1], shape=image_shape)
    mask[rr, cc] = True
    return mask
