"""Fixed-shape non-maximum suppression for TPU.

Replaces the torchvision CUDA NMS the reference exercises through
detectron2's RPN/box head (SURVEY.md §2b). Greedy NMS is a rank-ordered
recurrence; instead of translating the CUDA bitmask kernel, this uses a
Jacobi fixed-point iteration on the full (sorted) IoU matrix:

    keep(i) = valid(i) and not exists j < i: iou(j, i) > t and keep(j)

Iterating keep_{t+1} = f(keep_t) from all-true converges to the unique
greedy solution in at most `suppression chain depth` sweeps (typically < 10)
— each sweep is one fused (N, N) masked reduction on the VPU, instead of N
sequential steps. Shapes are static; invalid (padding) entries carry
-inf scores and never suppress anything.

Suppression uses strict inequality (iou > threshold), matching torchvision.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box_ops import pairwise_iou

NEG_INF = -1e10

# Exactness bound for the Jacobi sweep: results match greedy NMS exactly
# whenever the longest suppression chain is shorter than this (trained
# detectors: < ~20). Bounds latency on degenerate inputs.
MAX_SWEEPS = 128


def nms_mask(boxes, scores, valid, iou_threshold):
    """Greedy NMS. Returns a bool keep-mask in the original box order.

    boxes: (n, 4) XYXY; scores: (n,); valid: (n,) bool. Padding rows must
    have valid=False (their scores are ignored).
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    b = boxes[order]
    v = valid[order]

    iou = pairwise_iou(b, b)
    rank = jnp.arange(n)
    # higher(j, i): j strictly higher-ranked than i
    higher = rank[:, None] < rank[None, :]
    suppress = (iou > iou_threshold) & higher & v[:, None]

    # After t sweeps every box whose suppression-chain depth is <= t holds
    # its final value. Trained detectors produce chains well under ~20; the
    # static MAX_SWEEPS cap bounds worst-case latency on degenerate inputs
    # (e.g. untrained nets emitting massive score ties), where chains can
    # reach n and each extra sweep costs a full masked (n, n) reduction.
    max_sweeps = min(n, MAX_SWEEPS)

    def cond(state):
        keep, prev, t = state
        return jnp.any(keep != prev) & (t < max_sweeps)

    def body(state):
        keep, _, t = state
        new = v & ~jnp.any(suppress & keep[:, None], axis=0)
        return new, keep, t + 1

    keep0 = v & ~jnp.any(suppress & v[:, None], axis=0)
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, v, jnp.int32(1)))

    # scatter back to original order
    out = jnp.zeros(n, bool).at[order].set(keep)
    return out


def batched_nms_mask(boxes, scores, idxs, valid, iou_threshold):
    """Classwise/levelwise NMS via the coordinate-offset trick.

    Boxes of different ``idxs`` never suppress each other (torchvision
    batched_nms semantics).
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = idxs.astype(jnp.float32) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, valid, iou_threshold)


@partial(jax.jit, static_argnames=("k",))
def top_k_by_score(scores, valid, k):
    """Indices + validity of the k highest valid scores (static k)."""
    masked = jnp.where(valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, k)
    return idx, vals > NEG_INF / 2
