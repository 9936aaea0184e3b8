"""Vectorized region properties computed directly from RLE masks.

Replaces the skimage.measure.regionprops_table dependency of the reference's
InstanceSet.compute_rprops (reference structures.py:474-514), which decoded
each mask to a full-image array in a python loop (~30 s on the demo set,
notebook cell 55). Here per-mask pixel coordinates are reconstructed straight
from the run-length counts (O(mask area), never O(image area)) and all
moments are numpy reductions; the demo set takes milliseconds.

Property definitions follow skimage.measure.regionprops: moments-based
ellipse properties, the weighted boundary-configuration perimeter estimator,
and solidity from the convex hull of pixel centers.
"""
from __future__ import annotations

import numpy as np

from .. import rle as RLE

SUPPORTED = (
    "area", "equivalent_diameter", "major_axis_length", "minor_axis_length",
    "perimeter", "solidity", "orientation", "centroid", "eccentricity",
    "bbox", "extent",
)

_PERIM_WEIGHTS = np.zeros(50)
_PERIM_WEIGHTS[[5, 7, 15, 17, 25, 27]] = 1.0
_PERIM_WEIGHTS[[21, 33]] = np.sqrt(2.0)
_PERIM_WEIGHTS[[13, 23]] = (1.0 + np.sqrt(2.0)) / 2.0


def _pixel_coords(rle) -> tuple[np.ndarray, np.ndarray]:
    """(rows, cols) of set pixels, straight from column-major run counts."""
    h = int(rle["size"][0])
    cnts = RLE.decode_counts(rle).astype(np.int64)
    ends = np.cumsum(cnts)
    starts = ends - cnts
    s1 = starts[1::2]
    l1 = cnts[1::2]
    total = int(l1.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # linear indices of all 1-pixels: repeat each run start, add intra-run
    # offsets
    base = np.repeat(s1, l1)
    within = np.arange(total) - np.repeat(np.cumsum(l1) - l1, l1)
    idx = base + within
    rows = idx % h
    cols = idx // h
    return rows, cols


def _crop_mask(rows, cols):
    r0, c0 = rows.min(), cols.min()
    m = np.zeros((rows.max() - r0 + 1, cols.max() - c0 + 1), dtype=np.uint8)
    m[rows - r0, cols - c0] = 1
    return m, int(r0), int(c0)


def _perimeter(crop: np.ndarray) -> float:
    """skimage.measure.perimeter (4-neighborhood boundary weights)."""
    img = np.pad(crop, 1)
    # 4-connected erosion
    core = (img[1:-1, 1:-1] & img[:-2, 1:-1] & img[2:, 1:-1]
            & img[1:-1, :-2] & img[1:-1, 2:])
    border = np.pad(img[1:-1, 1:-1] - core, 1)
    # convolve border with [[10, 2], [1, 0]]
    xf = (10 * border[:-1, :-1] + 2 * border[:-1, 1:] + 1 * border[1:, :-1])
    hist = np.bincount(xf.ravel(), minlength=50)[:50]
    return float(hist @ _PERIM_WEIGHTS)


def _convex_hull_area(rows, cols) -> float:
    """Pixel count of the filled convex hull of the pixel centers.

    Row-wise: for each pixel row the hull is an interval [xl, xr] found by
    intersecting the row with every hull edge — O(rows x edges) instead of
    O(bbox_area x edges).
    """
    if rows.size <= 2:
        return float(rows.size)
    # hull candidates: per-row extreme columns only (2 points per row)
    order = np.lexsort((cols, rows))
    r_sorted, c_sorted = rows[order], cols[order]
    _, first = np.unique(r_sorted, return_index=True)
    last = np.concatenate([first[1:] - 1, [r_sorted.size - 1]])
    cand = np.concatenate([
        np.stack([r_sorted[first], c_sorted[first]], 1),
        np.stack([r_sorted[last], c_sorted[last]], 1)]).astype(np.float64)
    hull = _monotone_chain(np.unique(cand, axis=0))
    if hull.shape[0] < 3:
        return float(rows.size)
    a = hull                       # (E, 2) as (r, c)
    b = np.roll(hull, -1, axis=0)
    rr = np.arange(rows.min(), rows.max() + 1).astype(np.float64)  # (R,)

    ar, ac = a[:, 0][None, :], a[:, 1][None, :]   # (1, E)
    br, bc = b[:, 0][None, :], b[:, 1][None, :]
    y = rr[:, None]                                # (R, 1)
    dr = br - ar
    # edges crossing this row (inclusive, tolerate horizontal edges)
    lo = np.minimum(ar, br) - 1e-9
    hi = np.maximum(ar, br) + 1e-9
    crosses = (y >= lo) & (y <= hi)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(np.abs(dr) > 1e-12, (y - ar) / dr, 0.0)
    x_at = ac + t * (bc - ac)
    # horizontal edges contribute both endpoints
    x_horiz_lo = np.where(np.abs(dr) <= 1e-12, np.minimum(ac, bc), np.inf)
    x_horiz_hi = np.where(np.abs(dr) <= 1e-12, np.maximum(ac, bc), -np.inf)
    x_cand_lo = np.where(crosses, np.minimum(x_at, x_horiz_lo), np.inf)
    x_cand_hi = np.where(crosses, np.maximum(x_at, x_horiz_hi), -np.inf)
    xl = x_cand_lo.min(axis=1)
    xr = x_cand_hi.max(axis=1)
    counts = np.floor(xr + 1e-9) - np.ceil(xl - 1e-9) + 1
    return float(np.maximum(counts, 0).sum())


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain convex hull; pts sorted unique (n, 2)."""
    if len(pts) <= 2:
        return pts

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                o, q = out[-2], out[-1]
                if ((q[0] - o[0]) * (p[1] - o[1])
                        - (q[1] - o[1]) * (p[0] - o[0])) <= 0:
                    out.pop()
                else:
                    break
            out.append(tuple(p))
        return out[:-1]

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower + upper)


def regionprops_one(rle, keys) -> dict:
    rows, cols = _pixel_coords(rle)
    area = float(rows.size)
    out = {}
    if area == 0:
        for k in keys:
            out[k] = 0.0
        return out
    rbar, cbar = rows.mean(), cols.mean()
    dr = rows - rbar
    dc = cols - cbar
    n = area
    mu20 = (dr * dr).sum() / n + 1.0 / 12.0  # pixel extent correction
    mu02 = (dc * dc).sum() / n + 1.0 / 12.0
    mu11 = (dr * dc).sum() / n
    # inertia tensor eigenvalues
    t = mu20 + mu02
    d = np.sqrt(max((mu20 - mu02) ** 2 + 4 * mu11 ** 2, 0.0))
    l1 = (t + d) / 2
    l2 = (t - d) / 2

    crop = None
    for k in keys:
        if k == "area":
            out[k] = area
        elif k == "equivalent_diameter":
            out[k] = float(np.sqrt(4 * area / np.pi))
        elif k == "major_axis_length":
            out[k] = float(4 * np.sqrt(max(l1, 0)))
        elif k == "minor_axis_length":
            out[k] = float(4 * np.sqrt(max(l2, 0)))
        elif k == "eccentricity":
            out[k] = float(np.sqrt(1 - l2 / l1)) if l1 > 0 else 0.0
        elif k == "orientation":
            if mu20 - mu02 == 0 and mu11 == 0:
                out[k] = 0.0
            else:
                out[k] = float(0.5 * np.arctan2(2 * mu11, mu02 - mu20))
        elif k == "perimeter":
            if crop is None:
                crop, _, _ = _crop_mask(rows, cols)
            out[k] = _perimeter(crop)
        elif k == "solidity":
            out[k] = area / max(_convex_hull_area(rows, cols), 1.0)
        elif k == "centroid":
            out["centroid-0"] = float(rbar)
            out["centroid-1"] = float(cbar)
        elif k == "bbox":
            out["bbox-0"] = int(rows.min())
            out["bbox-1"] = int(cols.min())
            out["bbox-2"] = int(rows.max() + 1)
            out["bbox-3"] = int(cols.max() + 1)
        elif k == "extent":
            bb_area = ((rows.max() - rows.min() + 1)
                       * (cols.max() - cols.min() + 1))
            out[k] = area / bb_area
        else:
            raise ValueError(f"unsupported region property: {k}")
    return out


def regionprops_table(rles, keys) -> list[dict]:
    """Per-mask property dicts for a list of RLE masks."""
    return [regionprops_one(r, keys) for r in rles]
