"""Box arithmetic in JAX (XYXY_ABS, continuous coordinates).

Replaces the detectron2/torchvision box utilities exercised through the
reference's model config (SURVEY.md §2b): delta encode/apply with the
Faster R-CNN parameterization, pairwise IoU, and clipping. All functions are
jit-safe (static shapes, no data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp

# max dw/dh so exp() cannot overflow (Faster R-CNN convention: log(1000/16))
SCALE_CLAMP = 4.135166556742356


def apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply (dx, dy, dw, dh) regression deltas to XYXY boxes.

    deltas: (..., 4) or (..., k*4); boxes: (..., 4). Returns same shape as
    deltas.
    """
    boxes = boxes.astype(jnp.float32)
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    shape = deltas.shape
    d = deltas.reshape(*shape[:-1], -1, 4)
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(d[..., 3] / wh, SCALE_CLAMP)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack([
        pred_ctr_x - 0.5 * pred_w,
        pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w,
        pred_ctr_y + 0.5 * pred_h,
    ], axis=-1)
    return out.reshape(shape)


def get_deltas(src_boxes, target_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Regression deltas that transform src boxes into target boxes."""
    src = src_boxes.astype(jnp.float32)
    tgt = target_boxes.astype(jnp.float32)
    src_w = src[..., 2] - src[..., 0]
    src_h = src[..., 3] - src[..., 1]
    src_cx = src[..., 0] + 0.5 * src_w
    src_cy = src[..., 1] + 0.5 * src_h
    tgt_w = tgt[..., 2] - tgt[..., 0]
    tgt_h = tgt[..., 3] - tgt[..., 1]
    tgt_cx = tgt[..., 0] + 0.5 * tgt_w
    tgt_cy = tgt[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    eps = 1e-7
    src_w = jnp.maximum(src_w, eps)
    src_h = jnp.maximum(src_h, eps)
    dx = wx * (tgt_cx - src_cx) / src_w
    dy = wy * (tgt_cy - src_cy) / src_h
    dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / src_w)
    dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / src_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def pairwise_iou(boxes1, boxes2):
    """(n, m) IoU between two box sets (XYXY, continuous area convention)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def clip_boxes(boxes, image_size):
    """Clip XYXY boxes to [0, w] x [0, h]. image_size = (h, w)."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes, threshold=0.0):
    """Mask of boxes with both sides > threshold."""
    return ((boxes[..., 2] - boxes[..., 0] > threshold)
            & (boxes[..., 3] - boxes[..., 1] > threshold))
