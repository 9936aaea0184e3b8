"""Multilevel RoIAlign (V2, aligned) as XLA gathers over fused FPN levels.

Replaces the detectron2/torchvision CUDA RoIAlign the reference exercises
through the box/mask heads (SURVEY.md §2b). TPU-first design decisions:

* All FPN levels are flattened and concatenated into ONE row-indexed
  tensor, so pooling N boxes assigned to different levels is a single fused
  gather — no per-level dynamic partitioning (which XLA cannot shape).
* **Corner packing**: TPU gather cost is dominated by the number of
  gathered rows, not bytes (measured: row width 128 vs 512 bytes changes
  latency < 10%). The feature tensor is pre-packed so each row holds all
  four bilinear corners [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] — one
  gathered row per sampling point instead of four (4x fewer rows, ~4x
  faster pooling) at the cost of 4x feature bytes, built once per image
  and shared by the box and mask heads.
* Sampling-point coordinates depend on per-box traced values but the point
  count is static: ``max_sr`` points per bin axis, with adaptive sampling
  (sampling_ratio=0: sr = ceil(bin_size), as ROIAlignV2) realized by
  zeroing the weights of unused points.
* Gathers are chunked with lax.map to bound transient HBM.

Coordinate semantics of ROIAlignV2 (aligned=True): box coords are scaled by
1/stride then shifted by -0.5 so sampling points align with feature pixel
centers; points outside [-1, size] contribute zero (but still count in the
adaptive average); bilinear corners clamp at the feature border.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def assign_levels(boxes, min_level=2, max_level=5, canonical_level=4,
                  canonical_size=224.0):
    """FPN level index for each box (detectron2 assign_boxes_to_levels)."""
    area = jnp.clip((boxes[:, 2] - boxes[:, 0])
                    * (boxes[:, 3] - boxes[:, 1]), 0)
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level
                    + jnp.log2(sqrt_area / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def _pack_corners(f):
    """(H, W, C) -> (H, W, 4C): [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)].

    Out-of-bounds shifts are zero-padded; the interpolation weights for
    clamped corners are zero by construction, so the padding never leaks.
    """
    fx = jnp.pad(f[:, 1:], ((0, 0), (0, 1), (0, 0)))
    row = jnp.concatenate([f, fx], axis=-1)
    ry = jnp.pad(row[1:], ((0, 1), (0, 0), (0, 0)))
    return jnp.concatenate([row, ry], axis=-1)


def pack_feature_levels(features):
    """Corner-pack + flatten a list of (H_l, W_l, C) maps.

    Returns (flat4 (sum HW, 4C), offsets, heights, widths).
    """
    flats = []
    offsets = []
    heights = []
    widths = []
    off = 0
    for f in features:
        h, w, c = f.shape
        flats.append(_pack_corners(f).reshape(h * w, 4 * c))
        offsets.append(off)
        heights.append(h)
        widths.append(w)
        off += h * w
    return (jnp.concatenate(flats, axis=0),
            jnp.asarray(offsets, jnp.int32),
            jnp.asarray(heights, jnp.int32),
            jnp.asarray(widths, jnp.int32))


def _interp_axis(coord, size):
    """1-D bilinear setup: low index, fraction, in-range mask.

    ROIAlignV2 semantics: out-of-range beyond [-1, size] contributes zero;
    coords clamp to [0, size-1]; at the top border frac = 0.
    """
    out_of_range = (coord < -1.0) | (coord > size.astype(jnp.float32))
    c = jnp.clip(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    at_end = low >= size - 1
    low = jnp.where(at_end, size - 1, low)
    frac = jnp.where(at_end, 0.0, c - low.astype(jnp.float32))
    return low, frac, ~out_of_range


@partial(jax.jit, static_argnames=("output_size", "max_sr", "strides",
                                   "sampling_ratio", "chunk", "use_pallas"))
def roi_align_packed(packed, boxes, levels, *, strides, output_size=7,
                     max_sr=2, sampling_ratio=0, chunk=256,
                     use_pallas=None):
    """Pool N boxes from corner-packed FPN levels into (N, P, P, C).

    packed: result of pack_feature_levels (flat4, offsets, heights, widths);
    boxes: (N, 4) XYXY image coords; levels: (N,) int32 into the level list;
    strides: static per-level tuple. On TPU the post-gather weighted
    reduction runs as a Pallas kernel (use_pallas=None autodetects).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not isinstance(sampling_ratio, int):
        raise TypeError("sampling_ratio must be a static int")
    flat4, offsets, heights, widths = packed
    n = boxes.shape[0]
    P = output_size
    S = max_sr if sampling_ratio == 0 else sampling_ratio
    C = flat4.shape[1] // 4

    stride_arr = jnp.asarray(strides, jnp.float32)
    scale_n = 1.0 / stride_arr[levels]
    H_n = heights[levels]
    W_n = widths[levels]
    off_n = offsets[levels]

    x0 = boxes[:, 0] * scale_n - 0.5
    y0 = boxes[:, 1] * scale_n - 0.5
    x1 = boxes[:, 2] * scale_n - 0.5
    y1 = boxes[:, 3] * scale_n - 0.5
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P

    if sampling_ratio > 0:
        sr_x = jnp.full((n,), sampling_ratio, jnp.int32)
        sr_y = sr_x
    else:
        sr_y = jnp.clip(jnp.ceil((y1 - y0) / P), 1, S).astype(jnp.int32)
        sr_x = jnp.clip(jnp.ceil((x1 - x0) / P), 1, S).astype(jnp.int32)

    pbin = jnp.arange(P, dtype=jnp.float32)
    ssub = jnp.arange(S, dtype=jnp.float32)
    ys = (y0[:, None, None] + pbin[None, :, None] * bin_h[:, None, None]
          + (ssub[None, None, :] + 0.5) * bin_h[:, None, None]
          / sr_y[:, None, None].astype(jnp.float32))       # (N, P, S)
    xs = (x0[:, None, None] + pbin[None, :, None] * bin_w[:, None, None]
          + (ssub[None, None, :] + 0.5) * bin_w[:, None, None]
          / sr_x[:, None, None].astype(jnp.float32))
    y_used = ssub[None, None, :] < sr_y[:, None, None]
    x_used = ssub[None, None, :] < sr_x[:, None, None]

    yl, fy, y_in = _interp_axis(ys, H_n[:, None, None])
    xl, fx, x_in = _interp_axis(xs, W_n[:, None, None])

    fdtype = flat4.dtype

    def pool_chunk(args):
        (yl_c, fy_c, ym_c, xl_c, fx_c, xm_c, off_c, w_c, sry_c, srx_c) = args
        B = yl_c.shape[0]
        # bin-contiguous point order (b, py, qx, sy, sx): the S*S*4 terms
        # of one output bin are adjacent, so the post-gather reduction is a
        # single streaming pass
        idx = (off_c[:, None, None, None, None]
               + yl_c[:, :, None, :, None] * w_c[:, None, None, None, None]
               + xl_c[:, None, :, None, :])                 # (B, P, Q, S, S)
        rows = jnp.take(flat4, idx.reshape(B, -1), axis=0)  # (B, pts, 4C)
        # combined corner weights; invalid/unused points weigh zero;
        # fold in the adaptive-average normalization. Chunk-padding rows
        # carry sr = 0: clamp so 0/0 NaNs can't leak into the feature
        # gradients through the backward scatter.
        wy = jnp.stack([1.0 - fy_c, fy_c], axis=-1)         # (B, P, S, 2)
        wx = jnp.stack([1.0 - fx_c, fx_c], axis=-1)
        valid = (ym_c[:, :, None, :, None]
                 & xm_c[:, None, :, None, :]).astype(jnp.float32)
        count = jnp.maximum((sry_c * srx_c).astype(jnp.float32), 1.0)
        w4 = (wy[:, :, None, :, None, :, None]
              * wx[:, None, :, None, :, None, :]).reshape(
                  B, P, P, S, S, 4) * valid[..., None] \
            / count[:, None, None, None, None, None]        # (B,P,Q,S,S,4)

        n_bins = B * P * P
        terms = S * S * 4
        if use_pallas and C % LANE == 0 and n_bins % 256 == 0:
            from .pallas_kernels import combine_pooled
            rows2 = rows.reshape(n_bins, terms * C)
            pad_t = (-terms) % LANE
            w2 = jnp.pad(w4.reshape(n_bins, terms), ((0, 0), (0, pad_t)))
            pooled = combine_pooled(rows2, w2, channels=C,
                                    block=256).reshape(B, P, P, C)
        else:
            r = rows.reshape(B, P, P, S * S, 4, C)
            w = w4.reshape(B, P, P, S * S, 4)
            acc = jnp.zeros((B, P, P, C), jnp.float32)
            for j in range(S * S):
                for k in range(4):
                    acc = acc + (r[:, :, :, j, k, :].astype(jnp.float32)
                                 * w[:, :, :, j, k, None])
            pooled = acc
        return pooled.astype(fdtype)

    n_chunks = math.ceil(n / chunk)
    pad = n_chunks * chunk - n

    def pad0(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    y_mask = y_in & y_used
    x_mask = x_in & x_used
    args = tuple(
        pad0(a).reshape(n_chunks, chunk, *a.shape[1:]) for a in
        (yl, fy, y_mask, xl, fx, x_mask, off_n, W_n, sr_y, sr_x))
    out = jax.lax.map(pool_chunk, args)
    return out.reshape(n_chunks * chunk, P, P, C)[:n]


def multilevel_roi_align(features, boxes, levels, *, strides,
                         output_size=7, max_sr=2, sampling_ratio=0,
                         chunk=256):
    """Pool N boxes from FPN levels into (N, P, P, C).

    features: list of (H_l, W_l, C) arrays matching ``strides``. Packs the
    levels internally; use pack_feature_levels + roi_align_packed to share
    the packing between several pooling calls.
    """
    packed = pack_feature_levels(features)
    return roi_align_packed(packed, boxes, levels, strides=strides,
                            output_size=output_size, max_sr=max_sr,
                            sampling_ratio=sampling_ratio, chunk=chunk)


def roi_align_single(feature, boxes, *, stride, output_size=7,
                     max_sr=2, sampling_ratio=0, chunk=128):
    """RoIAlign on a single feature map (testing / non-FPN path)."""
    levels = jnp.zeros(boxes.shape[0], jnp.int32)
    return multilevel_roi_align([feature], boxes, levels, strides=(stride,),
                                output_size=output_size, max_sr=max_sr,
                                sampling_ratio=sampling_ratio, chunk=chunk)


@partial(jax.jit, static_argnames=("output_size", "max_sr"))
def crop_resize_instance_canvases(canvases, meta, boxes, mask_idx, im_size,
                                  *, output_size=28, max_sr=2):
    """Mask targets from per-instance crop canvases.

    TPU-native replacement for cropping dense full-resolution GT mask
    stacks (a (B, G, H, W) uint8 tensor is ~400 MB/image for the powder
    workload — dominating both host->device transfer and device
    relayouts). Each GT instance instead ships as a (T, T) uint8 canvas
    holding its mask crop (zero border guaranteed) plus an affine map
    back to resized-image coordinates:

        image_coord = meta[g, 0:2] + canvas_coord * meta[g, 2:4]

    Sampling semantics match crop_and_resize_masks (ROIAlignV2 at scale 1
    on the full-res plane): the GT mask is zero everywhere outside its
    crop, so samples beyond the canvas clamp into its zero border and
    contribute 0 — exactly the dense-path value. Exact for instances
    stored at native resolution (crop fits T - 2); larger instances are
    bilinearly downscaled into the canvas (loader side), making targets
    a low-passed approximation for those.

    canvases: (G, T, T) uint8; meta: (G, 4) float32 (a_y, a_x, scale_y,
    scale_x);
    boxes: (M, 4) XYXY resized-image coords; mask_idx: (M,) int32;
    im_size: (2,) float (h, w) TRUE image extent — sample coords clamp to
    it first (ROIAlignV2 border replication, the detectron2 semantics:
    BitMasks live on an exactly image-sized plane) and samples beyond
    [-1, size] contribute zero. Note the dense fallback path samples the
    loader's zero-padded canvas plane instead, which attenuates
    bottom/right-edge samples rather than replicating them — this path
    is the reference-faithful one at image edges.
    Returns (M, P, P) float32.
    """
    g, t, _ = canvases.shape
    flat = canvases.reshape(g * t * t).astype(jnp.uint8)
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
    h_im = im_size[0].astype(jnp.float32)
    w_im = im_size[1].astype(jnp.float32)
    yv = yv & (ys >= -1.0) & (ys <= h_im)
    xv = xv & (xs >= -1.0) & (xs <= w_im)
    ys = jnp.clip(ys, 0.0, h_im - 1.0)
    xs = jnp.clip(xs, 0.0, w_im - 1.0)

    sel = jnp.clip(mask_idx.astype(jnp.int32), 0, g - 1)
    a = meta[sel]                                   # (M, 4)
    inv_y = 1.0 / jnp.maximum(a[:, 2], 1e-6)
    inv_x = 1.0 / jnp.maximum(a[:, 3], 1e-6)
    yc = (ys - a[:, 0, None, None]) * inv_y[:, None, None]
    xc = (xs - a[:, 1, None, None]) * inv_x[:, None, None]

    ycl = jnp.clip(yc, 0.0, t - 1.0)
    xcl = jnp.clip(xc, 0.0, t - 1.0)
    yl = jnp.clip(jnp.floor(ycl).astype(jnp.int32), 0, t - 2)
    xl = jnp.clip(jnp.floor(xcl).astype(jnp.int32), 0, t - 2)
    fy = ycl - yl.astype(jnp.float32)
    fx = xcl - xl.astype(jnp.float32)

    base = (sel * (t * t))[:, None, None, None, None]

    def flat_idx(yy, xx):
        return base + yy[:, :, :, None, None] * t + xx[:, None, None, :, :]

    valid = yv[:, :, :, None, None] & xv[:, None, None, :, :]
    acc = jnp.zeros((m, P, S, P, S), jnp.float32)
    for yy, wy in ((yl, 1.0 - fy), (yl + 1, fy)):
        for xx, wx in ((xl, 1.0 - fx), (xl + 1, fx)):
            v = jnp.take(flat, flat_idx(yy, xx).reshape(m, -1),
                         axis=0).reshape(m, P, S, P, S)
            acc = acc + v.astype(jnp.float32) \
                * (wy[:, :, :, None, None] * wx[:, None, None, :, :])
    acc = jnp.where(valid, acc, 0.0)
    count = (sr_y * sr_x).astype(jnp.float32)
    return acc.sum(axis=(2, 4)) / count[:, None, None]


def instance_mask_canvas(mask, canvas_size=128, origin=(0, 0)):
    """Host-side: pack one dense instance mask into a (T, T) crop canvas.

    ``mask`` may be the full-image mask or a local crop whose top-left
    sits at ``origin`` (y, x) in image coords — the loader rasterizes
    instances directly into local crops so packing is O(instance area),
    not O(image area). Returns (canvas uint8,
    (a_y, a_x, scale_y, scale_x) float). The canvas keeps a >= 1 px zero
    border on every side; instances larger than T - 2 px are bilinearly
    downscaled (aspect approximately preserved; the per-axis scales PIL
    actually applies can differ by rounding and are both stored so the
    inverse map is exact). Inverse map:
    image_coord = a[0:2] + canvas_coord * a[2:4].
    """
    t = canvas_size
    canvas = np.zeros((t, t), np.uint8)
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return canvas, np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)
    iy0, iy1 = int(ys.min()), int(ys.max()) + 1
    ix0, ix1 = int(xs.min()), int(xs.max()) + 1
    ch, cw = iy1 - iy0, ix1 - ix0
    crop = mask[iy0:iy1, ix0:ix1]
    scale = max(ch / (t - 2), cw / (t - 2), 1.0)
    scale_y = scale_x = 1.0
    if scale > 1.0:
        from PIL import Image
        hs = max(int(round(ch / scale)), 1)
        ws = max(int(round(cw / scale)), 1)
        crop = np.asarray(Image.fromarray(
            crop.astype(np.float32)).resize((ws, hs), Image.BILINEAR))
        crop = (crop >= 0.5).astype(np.uint8)
        scale_y = ch / hs
        scale_x = cw / ws
    h, w = crop.shape
    canvas[1:1 + h, 1:1 + w] = crop
    a_y = origin[0] + iy0 - 0.5 * scale_y - 0.5
    a_x = origin[1] + ix0 - 0.5 * scale_x - 0.5
    return canvas, np.asarray([a_y, a_x, scale_y, scale_x], np.float32)


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

    size_h = jnp.full((1, 1, 1), h, jnp.int32)
    size_w = jnp.full((1, 1, 1), w, jnp.int32)
    yl, fy, yin = _interp_axis(ys, size_h)
    xl, fx, xin = _interp_axis(xs, size_w)
    yh = jnp.minimum(yl + 1, h - 1)
    xh = jnp.minimum(xl + 1, w - 1)
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
