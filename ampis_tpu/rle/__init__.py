"""COCO-bit-compatible RLE mask codec (TPU-framework host side).

Drop-in replacement for the ``pycocotools.mask`` API surface that the
reference framework uses (reference: ampis/structures.py:12,
ampis/analyze.py:11, ampis/data_utils.py:17, ampis/applications/powder.py:17):
``encode, decode, area, merge, iou, frPyObjects, toBbox``.

Masks are encoded column-major with alternating 0/1 run counts and a LEB128
-style compressed ``counts`` byte string, bit-identical to the COCO format so
that the pickles/JSON written by the reference round-trip exactly.

The heavy lifting happens in a multithreaded C++ library (csrc/rle.cpp)
loaded through ctypes; a pure-numpy fallback keeps everything working when
the native build is unavailable (set AMPIS_TPU_NO_NATIVE=1 to force it).

Extras beyond the pycocotools surface, used by the TPU pipeline:

* ``intersect_areas(query, rles)`` -- batched area(merge([q, r], intersect))
  for the powder satellite matcher hot loop (reference powder.py:82-83).
* ``paste_masks_to_rle(masks, boxes, (h, w))`` -- fused mask paste + encode:
  turns the model's (n, 28, 28) soft masks into full-resolution RLEs without
  materializing n x h x w bitmasks.
* ``label(img)`` -- 8-connected components (replaces skimage.measure.label
  at reference data_utils.py:413).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from . import _native

_LIB = _native.LIB

_NTHREADS = int(os.environ.get("AMPIS_TPU_RLE_THREADS", "0")) or (os.cpu_count() or 4)

__all__ = [
    "encode", "decode", "area", "merge", "iou", "frPyObjects", "toBbox",
    "intersect_areas", "paste_masks_to_rle", "label", "decode_counts",
    "encode_counts", "native_available",
]


def native_available() -> bool:
    return _LIB is not None


# ---------------------------------------------------------------------------
# counts string codec
# ---------------------------------------------------------------------------

def _counts_bytes(rle) -> bytes:
    c = rle["counts"]
    if isinstance(c, str):
        return c.encode("utf-8")
    return bytes(c)


def decode_counts(rle) -> np.ndarray:
    """Decode one RLE dict's compressed counts string to a uint32 array."""
    s = _counts_bytes(rle)
    if _LIB is not None:
        out = np.empty(max(len(s), 1), dtype=np.uint32)
        m = _LIB.rle_from_string(
            s, len(s), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out[:m].copy()
    return _py_from_string(s)


def encode_counts(counts: np.ndarray, h: int, w: int) -> dict:
    """Build an RLE dict from uint32 run counts."""
    counts = np.ascontiguousarray(counts, dtype=np.uint32)
    if _LIB is not None:
        buf = ctypes.create_string_buffer(max(int(counts.size) * 6, 1))
        n = _LIB.rle_to_string(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            counts.size, buf)
        s = buf.raw[:n]
    else:
        s = _py_to_string(counts)
    return {"size": [int(h), int(w)], "counts": s}


def _py_from_string(s: bytes) -> np.ndarray:
    cnts = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = 1
        while more:
            c = s[p] - 48
            x |= (c & 0x1F) << (5 * k)
            more = c & 0x20
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return np.asarray(cnts, dtype=np.uint32)


def _py_to_string(cnts: np.ndarray) -> bytes:
    out = bytearray()
    cnts = cnts.astype(np.int64)
    for i, c in enumerate(cnts):
        x = int(c)
        if i > 2:
            x -= int(cnts[i - 2])
        more = 1
        while more:
            ch = x & 0x1F
            x >>= 5
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(ch + 48)
    return bytes(out)


# ---------------------------------------------------------------------------
# packing helpers (list of RLE dicts -> concatenated counts for C calls)
# ---------------------------------------------------------------------------

def _pack(rles):
    """Concatenate decoded counts of a list of RLE dicts."""
    counts = [decode_counts(r) for r in rles]
    ms = np.asarray([c.size for c in counts], dtype=np.uint64)
    offs = np.zeros(len(counts), dtype=np.uint64)
    if len(counts):
        np.cumsum(ms[:-1], out=offs[1:])
        cat = np.concatenate(counts) if counts else np.empty(0, np.uint32)
    else:
        cat = np.empty(0, np.uint32)
    cat = np.ascontiguousarray(cat, dtype=np.uint32)
    return cat, offs, ms


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _size_hw(rles):
    h, w = rles[0]["size"]
    return int(h), int(w)


# ---------------------------------------------------------------------------
# public API (pycocotools.mask-compatible)
# ---------------------------------------------------------------------------

def encode(bimask):
    """Encode binary mask(s) to RLE.

    ``bimask`` must be Fortran-ordered uint8/bool, shape (h, w) for a single
    mask (returns a dict) or (h, w, n) for a stack (returns a list of dicts).
    """
    single = bimask.ndim == 2
    if single:
        bimask = bimask[:, :, None]
    h, w, n = bimask.shape
    # column-major per mask: transpose to (n, w, h) C-contiguous == F per mask
    m = np.ascontiguousarray(np.transpose(bimask, (2, 1, 0)).astype(np.uint8))
    if _LIB is not None:
        ms = np.empty(n, dtype=np.uint64)
        offs = np.empty(n, dtype=np.uint64)
        ptr = _LIB.rle_encode_batch(_u8p(m), h, w, n, _u64p(ms), _u64p(offs),
                                    _NTHREADS)
        total = int(ms.sum())
        cat = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint32)),
            shape=(max(total, 1),)).copy()
        _LIB.rle_buf_free(ptr)
        out = [encode_counts(cat[int(offs[i]):int(offs[i] + ms[i])], h, w)
               for i in range(n)]
    else:
        out = []
        for i in range(n):
            flat = m[i].reshape(-1)  # column-major order of mask i
            out.append(encode_counts(_runs_from_flat(flat), h, w))
    return out[0] if single else out


def _runs_from_flat(flat: np.ndarray) -> np.ndarray:
    flat = flat.astype(np.uint8)
    if flat.size == 0:
        return np.zeros(1, np.uint32)
    change = np.flatnonzero(np.diff(flat)) + 1
    idx = np.concatenate(([0], change, [flat.size]))
    runs = np.diff(idx)
    if flat[0] != 0:
        runs = np.concatenate(([0], runs))
    return runs.astype(np.uint32)


def decode(rleObjs):
    """Decode RLE(s) to binary mask(s): dict -> (h, w); list -> (h, w, n)."""
    single = isinstance(rleObjs, dict)
    rles = [rleObjs] if single else list(rleObjs)
    if not rles:
        return np.zeros((0, 0, 0), dtype=np.uint8)
    h, w = _size_hw(rles)
    n = len(rles)
    if _LIB is not None:
        cat, offs, ms = _pack(rles)
        out = np.empty((n, w, h), dtype=np.uint8)  # column-major per mask
        _LIB.rle_decode_batch(_u32p(cat), _u64p(offs), _u64p(ms), n, h, w,
                              _u8p(out), _NTHREADS)
        masks = np.transpose(out, (2, 1, 0))
    else:
        masks = np.zeros((h, w, n), dtype=np.uint8, order="F")
        for i, r in enumerate(rles):
            cnts = decode_counts(r).astype(np.int64)
            flat = np.zeros(h * w, dtype=np.uint8)
            pos = np.concatenate(([0], np.cumsum(cnts)))
            for j in range(1, len(cnts), 2):
                flat[pos[j]:pos[j + 1]] = 1
            masks[:, :, i] = flat.reshape((w, h)).T
    return masks[:, :, 0] if single else masks


def area(rleObjs):
    """Area(s) of RLE mask(s). dict -> int; list -> uint32 ndarray."""
    single = isinstance(rleObjs, dict)
    rles = [rleObjs] if single else list(rleObjs)
    if not rles:
        return np.zeros(0, dtype=np.uint32)
    if _LIB is not None:
        cat, offs, ms = _pack(rles)
        out = np.empty(len(rles), dtype=np.uint64)
        _LIB.rle_area_batch(_u32p(cat), _u64p(offs), _u64p(ms), len(rles),
                            _u64p(out), _NTHREADS)
    else:
        out = np.asarray(
            [int(decode_counts(r)[1::2].astype(np.uint64).sum()) for r in rles],
            dtype=np.uint64)
    out = out.astype(np.uint32)
    return out[0] if single else out


def merge(rleObjs, intersect=0):
    """Merge a list of RLEs via union (default) or intersection."""
    rles = list(rleObjs)
    if not rles:
        return {"size": [0, 0], "counts": b""}
    h, w = _size_hw(rles)
    if _LIB is not None:
        cat, offs, ms = _pack(rles)
        m_out = ctypes.c_uint64()
        ptr = _LIB.rle_merge_many(_u32p(cat), _u64p(offs), _u64p(ms),
                                  len(rles), int(bool(intersect)),
                                  ctypes.byref(m_out))
        m = int(m_out.value)
        counts = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint32)),
            shape=(max(m, 1),))[:m].copy()
        _LIB.rle_buf_free(ptr)
        return encode_counts(counts, h, w)
    masks = decode(rles).astype(bool)
    red = np.logical_and.reduce if intersect else np.logical_or.reduce
    out = red(masks, axis=2)
    return encode(np.asfortranarray(out.astype(np.uint8)))


def iou(dt, gt, pyiscrowd):
    """Pairwise IoU. Returns (len(dt), len(gt)) float64 array.

    Accepts lists of RLE dicts or (n, 4) xywh bbox ndarrays, matching
    pycocotools.mask.iou. ``pyiscrowd`` must have len(gt) entries; crowd
    ground truths use IoU = I / area(dt).
    """
    is_box = isinstance(dt, np.ndarray) or (
        len(dt) and isinstance(dt[0], (list, np.ndarray))
        and not isinstance(dt[0], dict))
    crowd = np.asarray(pyiscrowd, dtype=np.uint8)
    if is_box:
        return _bbox_iou(np.asarray(dt, np.float64), np.asarray(gt, np.float64),
                         crowd)
    dt = list(dt)
    gt = list(gt)
    if not dt or not gt:
        return np.zeros((len(dt), len(gt)))
    assert len(crowd) == len(gt), (
        "iscrowd must have the same length as gt")
    h, w = _size_hw(dt)
    if _LIB is not None:
        dcat, doffs, dms = _pack(dt)
        gcat, goffs, gms = _pack(gt)
        out = np.empty((len(dt), len(gt)), dtype=np.float64)
        _LIB.rle_iou_batch(_u32p(dcat), _u64p(doffs), _u64p(dms), len(dt),
                           _u32p(gcat), _u64p(goffs), _u64p(gms), len(gt),
                           h, w, _u8p(crowd), _f64p(out), _NTHREADS)
        return out
    dmask = decode(dt).astype(bool).reshape(h * w, len(dt))
    gmask = decode(gt).astype(bool).reshape(h * w, len(gt))
    inter = (dmask.T.astype(np.float64) @ gmask.astype(np.float64))
    da = dmask.sum(axis=0)[:, None].astype(np.float64)
    ga = gmask.sum(axis=0)[None, :].astype(np.float64)
    union = np.where(crowd[None, :] > 0, da, da + ga - inter)
    union = np.where(inter == 0, 1.0, union)
    return np.where(inter == 0, 0.0, inter / union)


def _bbox_iou(dt, gt, crowd):
    out = np.zeros((len(dt), len(gt)))
    for g in range(len(gt)):
        G = gt[g]
        ga = G[2] * G[3]
        for d in range(len(dt)):
            D = dt[d]
            da = D[2] * D[3]
            w = min(D[2] + D[0], G[2] + G[0]) - max(D[0], G[0])
            if w <= 0:
                continue
            h = min(D[3] + D[1], G[3] + G[1]) - max(D[1], G[1])
            if h <= 0:
                continue
            i = w * h
            u = da if crowd[g] else da + ga - i
            out[d, g] = i / u
    return out


def toBbox(rleObjs):
    """Bounding box(es) [x, y, w, h] of RLE mask(s)."""
    single = isinstance(rleObjs, dict)
    rles = [rleObjs] if single else list(rleObjs)
    if not rles:
        return np.zeros((0, 4))
    h, w = _size_hw(rles)
    if _LIB is not None:
        cat, offs, ms = _pack(rles)
        out = np.empty((len(rles), 4), dtype=np.float64)
        _LIB.rle_to_bbox_batch(_u32p(cat), _u64p(offs), _u64p(ms), len(rles),
                               h, w, _f64p(out), _NTHREADS)
    else:
        out = np.zeros((len(rles), 4))
        masks = decode(rles)
        for i in range(len(rles)):
            m = masks[:, :, i]
            cols = np.flatnonzero(m.any(axis=0))
            rows = np.flatnonzero(m.any(axis=1))
            if cols.size:
                out[i] = [cols[0], rows[0], cols[-1] - cols[0] + 1,
                          rows[-1] - rows[0] + 1]
    return out[0] if single else out


def frPyObjects(pyobj, h, w):
    """Convert polygons / uncompressed RLEs / boxes to RLE dict(s)."""
    if isinstance(pyobj, np.ndarray) and pyobj.ndim == 2:
        return [_fr_bbox(b, h, w) for b in pyobj]
    if isinstance(pyobj, dict):
        return _fr_uncompressed(pyobj, h, w)
    if isinstance(pyobj, (list, tuple)):
        if len(pyobj) and isinstance(pyobj[0], dict):
            return [_fr_uncompressed(o, h, w) for o in pyobj]
        if len(pyobj) and isinstance(pyobj[0], (list, tuple, np.ndarray)):
            return [_fr_poly(np.asarray(p, np.float64), h, w) for p in pyobj]
        if len(pyobj) in (0,) or isinstance(pyobj[0], (int, float, np.floating, np.integer)):
            # single flat polygon
            return _fr_poly(np.asarray(pyobj, np.float64), h, w)
    raise TypeError(f"unsupported input type for frPyObjects: {type(pyobj)}")


def _fr_uncompressed(obj, h, w):
    counts = np.asarray(obj["counts"], dtype=np.uint32)
    return encode_counts(counts, h, w)


def _fr_bbox(bb, h, w):
    x, y, bw, bh = [float(v) for v in bb]
    poly = np.asarray([x, y, x, y + bh, x + bw, y + bh, x + bw, y],
                      np.float64)
    return _fr_poly(poly, h, w)


def _fr_poly(xy: np.ndarray, h: int, w: int) -> dict:
    xy = np.ascontiguousarray(xy.reshape(-1), dtype=np.float64)
    k = xy.size // 2
    if _LIB is not None:
        m_out = ctypes.c_uint64()
        ptr = _LIB.rle_fr_poly(_f64p(xy), k, int(h), int(w),
                               ctypes.byref(m_out))
        m = int(m_out.value)
        counts = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint32)),
            shape=(max(m, 1),))[:m].copy()
        _LIB.rle_buf_free(ptr)
        return encode_counts(counts, h, w)
    return encode_counts(_py_fr_poly(xy, int(h), int(w)), h, w)


def _py_fr_poly(xy: np.ndarray, h: int, w: int) -> np.ndarray:
    """Pure-python port of the COCO polygon boundary-crossing rasterizer."""
    scale = 5.0
    k = xy.size // 2
    x = np.floor(scale * xy[0::2] + 0.5).astype(np.int64)
    y = np.floor(scale * xy[1::2] + 0.5).astype(np.int64)
    x = np.concatenate([x, x[:1]])
    y = np.concatenate([y, y[:1]])
    u_list, v_list = [], []
    for j in range(k):
        xs, xe, ys, ye = int(x[j]), int(x[j + 1]), int(y[j]), int(y[j + 1])
        dx, dy = abs(xe - xs), abs(ys - ye)
        flip = (dx >= dy and xs > xe) or (dx < dy and ys > ye)
        if flip:
            xs, xe, ys, ye = xe, xs, ye, ys
        s = (ye - ys) / dx if dx >= dy else (xe - xs) / dy
        if dx >= dy:
            for d in range(dx + 1):
                t = dx - d if flip else d
                u_list.append(t + xs)
                v_list.append(int(np.floor(ys + s * t + 0.5)))
        else:
            for d in range(dy + 1):
                t = dy - d if flip else d
                v_list.append(t + ys)
                u_list.append(int(np.floor(xs + s * t + 0.5)))
    xs_list, ys_list = [], []
    for j in range(1, len(u_list)):
        if u_list[j] != u_list[j - 1]:
            xd = float(u_list[j] if u_list[j] < u_list[j - 1] else u_list[j] - 1)
            xd = (xd + 0.5) / scale - 0.5
            if np.floor(xd) != xd or xd < 0 or xd > w - 1:
                continue
            yd = float(min(v_list[j], v_list[j - 1]))
            yd = (yd + 0.5) / scale - 0.5
            yd = min(max(yd, 0), h)
            yd = np.ceil(yd)
            xs_list.append(int(xd))
            ys_list.append(int(yd))
    a = np.asarray([xx * h + yy for xx, yy in zip(xs_list, ys_list)]
                   + [h * w], dtype=np.uint32)
    a = np.sort(a)
    a = np.diff(np.concatenate(([0], a.astype(np.int64)))).astype(np.int64)
    b = [int(a[0])]
    j = 1
    while j < len(a):
        if a[j] > 0:
            b.append(int(a[j]))
            j += 1
        else:
            j += 1
            if j < len(a):
                b[-1] += int(a[j])
                j += 1
    return np.asarray(b, dtype=np.uint32)


# ---------------------------------------------------------------------------
# framework extras
# ---------------------------------------------------------------------------

def intersect_areas(query: dict, rles) -> np.ndarray:
    """area(merge([query, r], intersect=True)) for each r, as one C call."""
    rles = list(rles)
    if not rles:
        return np.zeros(0, dtype=np.uint64)
    if _LIB is not None:
        q = decode_counts(query)
        cat, offs, ms = _pack(rles)
        out = np.empty(len(rles), dtype=np.uint64)
        _LIB.rle_intersect_area_batch(_u32p(q), q.size, _u32p(cat),
                                      _u64p(offs), _u64p(ms), len(rles),
                                      _u64p(out), _NTHREADS)
        return out
    return np.asarray(
        [int(area(merge([query, r], intersect=True))) for r in rles],
        dtype=np.uint64)


def paste_masks_to_rle(masks: np.ndarray, boxes: np.ndarray, size,
                       thresh: float = 0.5):
    """Paste (n, mh, mw) soft masks into boxes on an (h, w) canvas -> RLEs.

    Bilinear resize with zero padding outside the box (semantics of torch
    grid_sample(align_corners=False) as used by detectron2's
    paste_masks_in_image), thresholded at ``thresh``, encoded column-major.
    Never materializes the n x h x w bitmask stack.
    """
    h, w = int(size[0]), int(size[1])
    masks = np.ascontiguousarray(masks, dtype=np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    n, mh, mw = masks.shape
    if n == 0:
        return []
    if _LIB is not None:
        ms = np.empty(n, dtype=np.uint64)
        offs = np.empty(n, dtype=np.uint64)
        ptr = _LIB.paste_masks_encode(_f32p(masks), _f32p(boxes), n, mh, mw,
                                      h, w, float(thresh), _u64p(ms),
                                      _u64p(offs), _NTHREADS)
        total = int(ms.sum())
        cat = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint32)),
            shape=(max(total, 1),)).copy()
        _LIB.rle_buf_free(ptr)
        return [encode_counts(cat[int(offs[i]):int(offs[i] + ms[i])], h, w)
                for i in range(n)]
    # numpy fallback
    out = []
    for i in range(n):
        x0, y0, x1, y1 = boxes[i]
        canvas = np.zeros((h, w), dtype=np.uint8)
        cx0 = min(max(int(np.floor(x0)) - 1, 0), w)
        cy0 = min(max(int(np.floor(y0)) - 1, 0), h)
        cx1 = max(min(int(np.ceil(x1)) + 1, w), cx0)
        cy1 = max(min(int(np.ceil(y1)) + 1, h), cy0)
        if cx1 > cx0 and cy1 > cy0:
            ys = (np.arange(cy0, cy1) + 0.5 - y0) / max(y1 - y0, 1e-9) * 2 - 1
            xs = (np.arange(cx0, cx1) + 0.5 - x0) / max(x1 - x0, 1e-9) * 2 - 1
            fy = ((ys + 1) * mh - 1) / 2
            fx = ((xs + 1) * mw - 1) / 2
            y0i = np.floor(fy).astype(np.int64)
            x0i = np.floor(fx).astype(np.int64)
            wy = (fy - y0i)[:, None]
            wx = (fx - x0i)[None, :]

            def g(yi, xi):
                val = np.zeros((yi.size, xi.size), np.float32)
                yv = (yi >= 0) & (yi < mh)
                xv = (xi >= 0) & (xi < mw)
                yc = np.clip(yi, 0, mh - 1)
                xc = np.clip(xi, 0, mw - 1)
                val = masks[i][np.ix_(yc, xc)] * yv[:, None] * xv[None, :]
                return val

            v = (g(y0i, x0i) * (1 - wy) * (1 - wx)
                 + g(y0i, x0i + 1) * (1 - wy) * wx
                 + g(y0i + 1, x0i) * wy * (1 - wx)
                 + g(y0i + 1, x0i + 1) * wy * wx)
            canvas[cy0:cy1, cx0:cx1] = v > thresh
        out.append(encode(np.asfortranarray(canvas)))
    return out


def label(img: np.ndarray):
    """8-connected component labeling. Returns (labels int32, n_labels)."""
    img = np.ascontiguousarray(img.astype(bool).astype(np.uint8))
    h, w = img.shape
    if _LIB is not None:
        out = np.empty((h, w), dtype=np.int32)
        n = _LIB.cc_label(_u8p(img),
                          h, w,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out, int(n)
    # BFS fallback
    out = np.zeros((h, w), dtype=np.int32)
    n = 0
    for r in range(h):
        for c in range(w):
            if img[r, c] and out[r, c] == 0:
                n += 1
                stack = [(r, c)]
                out[r, c] = n
                while stack:
                    rr, cc = stack.pop()
                    for dr in (-1, 0, 1):
                        for dc in (-1, 0, 1):
                            r2, c2 = rr + dr, cc + dc
                            if (0 <= r2 < h and 0 <= c2 < w and img[r2, c2]
                                    and out[r2, c2] == 0):
                                out[r2, c2] = n
                                stack.append((r2, c2))
    return out, n
