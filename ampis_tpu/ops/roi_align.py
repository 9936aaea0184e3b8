"""Multilevel RoIAlign (V2, aligned) as XLA gathers over fused FPN levels.

Replaces the detectron2/torchvision CUDA RoIAlign the reference exercises
through the box/mask heads (SURVEY.md §2b). TPU-first design decisions:

* All FPN levels are flattened and concatenated into ONE (sum_l H_l*W_l, C)
  tensor, so pooling N boxes assigned to different levels is a single fused
  gather — no per-level dynamic partitioning (which XLA cannot shape).
* Sampling-point coordinates depend on per-box traced values (box, level
  geometry) but the number of points is static: ``max_sampling_ratio``
  points per bin axis, with adaptive-sampling-ratio boxes (sampling_ratio=0
  semantics: sr = ceil(bin_size)) realized by masking the weights of unused
  points. Bit-exact with the reference's ROIAlignV2 for sr <= max_sr.
* Gathers are chunked over boxes with lax.map to bound the materialized
  (chunk, points, C) tensors in HBM.

Coordinate semantics of ROIAlignV2 (aligned=True): box coords are scaled by
1/stride then shifted by -0.5 so sampling points align with feature pixel
centers; points outside [-1, H] contribute zero; bilinear corners clamp at
the feature border.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def assign_levels(boxes, min_level=2, max_level=5, canonical_level=4,
                  canonical_size=224.0):
    """FPN level index for each box (detectron2 assign_boxes_to_levels)."""
    area = jnp.clip((boxes[:, 2] - boxes[:, 0])
                    * (boxes[:, 3] - boxes[:, 1]), 0)
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level
                    + jnp.log2(sqrt_area / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def flatten_levels(features):
    """Concat a list of (H_l, W_l, C) maps into (sum HW, C) + geometry.

    Returns (flat, offsets, heights, widths) with int32 geometry arrays of
    length n_levels.
    """
    flats = []
    offsets = []
    heights = []
    widths = []
    off = 0
    for f in features:
        h, w, c = f.shape
        flats.append(f.reshape(h * w, c))
        offsets.append(off)
        heights.append(h)
        widths.append(w)
        off += h * w
    return (jnp.concatenate(flats, axis=0),
            jnp.asarray(offsets, jnp.int32),
            jnp.asarray(heights, jnp.int32),
            jnp.asarray(widths, jnp.int32))


@partial(jax.jit, static_argnames=("output_size", "max_sr", "strides",
                                   "sampling_ratio", "chunk"))
def multilevel_roi_align(features, boxes, levels, *, strides,
                         output_size=7, max_sr=2, sampling_ratio=0,
                         chunk=128):
    """Pool N boxes from FPN levels into (N, P, P, C).

    features: list of (H_l, W_l, C) arrays, one per level (same order as
      ``strides``, a tuple like (4, 8, 16, 32)).
    boxes: (N, 4) XYXY in image coordinates.
    levels: (N,) int32 level index (0-based into ``features``).
    sampling_ratio: 0 for adaptive (sr = ceil(bin), capped at max_sr),
      else the fixed ratio (must be <= max_sr).
    """
    if not isinstance(sampling_ratio, int):
        raise TypeError("sampling_ratio must be a static int")
    flat, offsets, heights, widths = flatten_levels(features)
    n = boxes.shape[0]
    P = output_size
    S = max_sr
    C = flat.shape[1]

    stride_arr = jnp.asarray(strides, jnp.float32)
    scale_n = 1.0 / stride_arr[levels]          # (N,)
    H_n = heights[levels]                        # (N,)
    W_n = widths[levels]
    off_n = offsets[levels]

    # aligned=True: continuous coords, -0.5 offset
    x0 = boxes[:, 0] * scale_n - 0.5
    y0 = boxes[:, 1] * scale_n - 0.5
    x1 = boxes[:, 2] * scale_n - 0.5
    y1 = boxes[:, 3] * scale_n - 0.5
    roi_w = x1 - x0
    roi_h = y1 - y0
    bin_w = roi_w / P
    bin_h = roi_h / P

    if sampling_ratio > 0:
        sr_x = jnp.full((n,), sampling_ratio, jnp.int32)
        sr_y = sr_x
    else:
        sr_y = jnp.clip(jnp.ceil(roi_h / P), 1, S).astype(jnp.int32)
        sr_x = jnp.clip(jnp.ceil(roi_w / P), 1, S).astype(jnp.int32)

    # sample coordinates: (N, P*S) along each axis
    pbin = jnp.arange(P, dtype=jnp.float32)          # bin index
    ssub = jnp.arange(S, dtype=jnp.float32)          # sub-sample index
    # y = y0 + pbin*bin_h + (s + .5) * bin_h / sr_y
    ys = (y0[:, None, None] + pbin[None, :, None] * bin_h[:, None, None]
          + (ssub[None, None, :] + 0.5) * bin_h[:, None, None]
          / sr_y[:, None, None].astype(jnp.float32))   # (N, P, S)
    xs = (x0[:, None, None] + pbin[None, :, None] * bin_w[:, None, None]
          + (ssub[None, None, :] + 0.5) * bin_w[:, None, None]
          / sr_x[:, None, None].astype(jnp.float32))
    y_valid_pt = ssub[None, None, :] < sr_y[:, None, None]   # (N, P, S)
    x_valid_pt = ssub[None, None, :] < sr_x[:, None, None]

    def interp_axis(coord, size):
        """1-D bilinear setup: low index, weights, in-range mask."""
        out_of_range = (coord < -1.0) | (coord > size.astype(jnp.float32))
        c = jnp.clip(coord, 0.0)
        low = jnp.floor(c).astype(jnp.int32)
        at_end = low >= size - 1
        low = jnp.where(at_end, size - 1, low)
        high = jnp.where(at_end, size - 1, low + 1)
        frac = jnp.where(at_end, 0.0, c - low.astype(jnp.float32))
        return low, high, frac, ~out_of_range

    size_h = H_n[:, None, None]
    size_w = W_n[:, None, None]
    yl, yh, fy, y_in = interp_axis(ys, size_h)      # (N, P, S)
    xl, xh, fx, x_in = interp_axis(xs, size_w)

    # per-box constants for flattened index math
    def pool_chunk(args):
        (yl_c, yh_c, fy_c, yin_c, yval_c,
         xl_c, xh_c, fx_c, xin_c, xval_c,
         off_c, w_c, sry_c, srx_c) = args
        B = yl_c.shape[0]
        # combine y (P,S) with x (P,S) -> (B, P, S, P, S)
        def flat_idx(yy, xx):
            return (off_c[:, None, None, None, None]
                    + yy[:, :, :, None, None] * w_c[:, None, None, None, None]
                    + xx[:, None, None, :, :])

        wy_l = (1.0 - fy_c)
        wy_h = fy_c
        wx_l = (1.0 - fx_c)
        wx_h = fx_c
        valid = (yin_c & yval_c)[:, :, :, None, None] \
            & (xin_c & xval_c)[:, None, None, :, :]
        acc = jnp.zeros((B, P, S, P, S, C), jnp.float32)
        for yy, wy in ((yl_c, wy_l), (yh_c, wy_h)):
            for xx, wx in ((xl_c, wx_l), (xh_c, wx_h)):
                v = jnp.take(flat, flat_idx(yy, xx).reshape(B, -1),
                             axis=0).reshape(B, P, S, P, S, C)
                w = (wy[:, :, :, None, None] * wx[:, None, None, :, :])
                acc = acc + v.astype(jnp.float32) * w[..., None]
        acc = jnp.where(valid[..., None], acc, 0.0)
        # average over the (adaptive) sample grid
        count = (sry_c * srx_c).astype(jnp.float32)
        pooled = acc.sum(axis=(2, 4)) / count[:, None, None, None]
        return pooled  # (B, P, P, C)

    n_chunks = math.ceil(n / chunk)
    pad = n_chunks * chunk - n

    def pad0(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    args = tuple(
        pad0(a).reshape(n_chunks, chunk, *a.shape[1:]) for a in
        (yl, yh, fy, y_in, y_valid_pt, xl, xh, fx, x_in, x_valid_pt,
         off_n, W_n, sr_y, sr_x))
    out = jax.lax.map(pool_chunk, args)
    out = out.reshape(n_chunks * chunk, P, P, C)[:n]
    return out.astype(features[0].dtype)


def roi_align_single(feature, boxes, *, stride, output_size=7,
                     max_sr=2, sampling_ratio=0, chunk=128):
    """RoIAlign on a single feature map (testing / non-FPN path)."""
    levels = jnp.zeros(boxes.shape[0], jnp.int32)
    return multilevel_roi_align([feature], boxes, levels, strides=(stride,),
                                output_size=output_size, max_sr=max_sr,
                                sampling_ratio=sampling_ratio, chunk=chunk)


@partial(jax.jit, static_argnames=("output_size", "max_sr"))
def crop_and_resize_masks(masks, boxes, mask_idx, *, output_size=28,
                          max_sr=2):
    """Crop GT masks by boxes and resample to (M, P, P) float targets.

    detectron2 BitMasks.crop_and_resize semantics (ROIAlignV2 at
    spatial_scale 1 on the full-res mask plane, then threshold by the
    caller). masks: (G, H, W) uint8/bool stack; boxes: (M, 4) XYXY;
    mask_idx: (M,) which mask each box crops. Adaptive sampling ratio
    capped at max_sr (the reference's GPU path uses the uncapped adaptive
    count; the cap only perturbs interior-average bins of very large
    instances, below the 0.5 binarization threshold's sensitivity in
    practice).
    """
    g, h, w = masks.shape
    flat = masks.reshape(g * h * w).astype(jnp.uint8)
    m = boxes.shape[0]
    P = output_size
    S = max_sr

    x0 = boxes[:, 0] - 0.5
    y0 = boxes[:, 1] - 0.5
    x1 = boxes[:, 2] - 0.5
    y1 = boxes[:, 3] - 0.5
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P
    sr_y = jnp.clip(jnp.ceil((y1 - y0) / P), 1, S).astype(jnp.int32)
    sr_x = jnp.clip(jnp.ceil((x1 - x0) / P), 1, S).astype(jnp.int32)

    pbin = jnp.arange(P, dtype=jnp.float32)
    ssub = jnp.arange(S, dtype=jnp.float32)
    ys = (y0[:, None, None] + pbin[None, :, None] * bin_h[:, None, None]
          + (ssub[None, None, :] + 0.5) * bin_h[:, None, None]
          / sr_y[:, None, None].astype(jnp.float32))
    xs = (x0[:, None, None] + pbin[None, :, None] * bin_w[:, None, None]
          + (ssub[None, None, :] + 0.5) * bin_w[:, None, None]
          / sr_x[:, None, None].astype(jnp.float32))
    yv = ssub[None, None, :] < sr_y[:, None, None]
    xv = ssub[None, None, :] < sr_x[:, None, None]

    def interp_axis(coord, size):
        oor = (coord < -1.0) | (coord > float(size))
        c = jnp.clip(coord, 0.0)
        low = jnp.floor(c).astype(jnp.int32)
        at_end = low >= size - 1
        low = jnp.where(at_end, size - 1, low)
        high = jnp.where(at_end, size - 1, low + 1)
        frac = jnp.where(at_end, 0.0, c - low.astype(jnp.float32))
        return low, high, frac, ~oor

    yl, yh, fy, yin = interp_axis(ys, h)
    xl, xh, fx, xin = interp_axis(xs, w)
    base = (mask_idx.astype(jnp.int32) * (h * w))[:, None, None, None, None]

    def flat_idx(yy, xx):
        return base + yy[:, :, :, None, None] * w + xx[:, None, None, :, :]

    valid = (yin & yv)[:, :, :, None, None] & (xin & xv)[:, None, None, :, :]
    acc = jnp.zeros((m, P, S, P, S), jnp.float32)
    for yy, wy in ((yl, 1.0 - fy), (yh, fy)):
        for xx, wx in ((xl, 1.0 - fx), (xh, fx)):
            v = jnp.take(flat, flat_idx(yy, xx).reshape(m, -1),
                         axis=0).reshape(m, P, S, P, S)
            acc = acc + v.astype(jnp.float32) \
                * (wy[:, :, :, None, None] * wx[:, None, None, :, :])
    acc = jnp.where(valid, acc, 0.0)
    count = (sr_y * sr_x).astype(jnp.float32)
    return acc.sum(axis=(2, 4)) / count[:, None, None]
