"""Region Proposal Network: head, proposal selection, and losses.

Reference model dependency (SURVEY.md §2b): shared 3x3 conv head with
per-anchor objectness + 4 box deltas on P2-P6; per-level pre-NMS top-k
(train 2000 / test 1000), per-level NMS at 0.7 realized as one classwise
NMS over concatenated levels, then a global post-NMS top-k (1000).

TPU-first: every stage is a fixed-shape masked tensor op. Proposal counts
never change shape — padding proposals carry valid=False and -inf scores.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import box_ops
from ..ops.nms import NEG_INF, nms_mask


class _ConvParams(nn.Module):
    """Declares a conv's {kernel, bias} without computing.

    Keeps the param tree identical to an nn.Conv of the same name (the
    Detectron2 weight converter and the model tests address
    ``objectness_logits/kernel`` etc. by path) while letting the caller
    fuse several sibling convs into one pass over the input tensor.
    """
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class RPNHead(nn.Module):
    """3x3 conv + two 1x1 sibling convs, shared across levels.

    The objectness and delta 1x1 convs are computed as ONE fused conv
    over concatenated output channels (A + A*4): both read the same
    (B, H, W, 256) activation, and at P2 resolution that read is the
    whole cost — merging halves the HBM traffic of the sibling pair.
    Param tree and numerics are identical to two separate convs.
    """
    num_anchors: int = 3
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], int8=False):
        """``int8`` (inference-only; mirrors models.resnet Bottleneck):
        "calib" records one activation scale per level for the shared 3x3
        conv input and the relu'd head activation; "static" runs both the
        3x3 conv and the fused sibling 1x1s as int8."""
        a = self.num_anchors
        obj_k, obj_b = _ConvParams(a, self.channels,
                                   name="objectness_logits")()
        del_k, del_b = _ConvParams(a * 4, self.channels,
                                   name="anchor_deltas")()
        w = jnp.concatenate([obj_k, del_k], -1)
        bias = jnp.concatenate([obj_b, del_b])

        if int8:
            zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
            in_s = [self.variable("quant", f"in_scale{i}", zero)
                    for i in range(len(features))]
            mid_s = [self.variable("quant", f"mid_scale{i}", zero)
                     for i in range(len(features))]

        if int8 == "static":
            from ..ops.quant import conv2d_int8, quantize_static
            from .layers import _ConvBiasParams
            ck, cb = _ConvBiasParams(
                (3, 3, features[0].shape[-1], self.channels),
                name="conv")()
            logits_out, deltas_out = [], []
            for i, f in enumerate(features):
                xq = quantize_static(f, in_s[i].value)
                t8 = conv2d_int8(xq, ck, cb,
                                 padding=((1, 1), (1, 1)), relu=True,
                                 sx=in_s[i].value,
                                 out_scale=mid_s[i].value)
                y = conv2d_int8(t8, w, bias, padding=((0, 0), (0, 0)),
                                relu=False, sx=mid_s[i].value,
                                out_dtype=jnp.float32)
                b, h, w_, _ = y.shape
                logits_out.append(y[..., :a].reshape(b, -1))
                deltas_out.append(y[..., a:])
            return logits_out, deltas_out

        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")
        wd = w.astype(self.dtype)
        biasd = bias.astype(self.dtype)
        logits_out, deltas_out = [], []
        for i, f in enumerate(features):
            if int8 == "calib":
                amax = jnp.max(jnp.abs(f.astype(jnp.float32)))
                in_s[i].value = jnp.maximum(amax, 1e-12) / 127.0
            t = nn.relu(conv(f))
            if int8 == "calib":
                amax = jnp.max(jnp.abs(t.astype(jnp.float32)))
                mid_s[i].value = jnp.maximum(amax, 1e-12) / 127.0
            b, h, w_, _ = t.shape
            y = jax.lax.conv_general_dilated(
                t, wd, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + biasd
            # NHWC conv output order (y, x, a) matches anchor grid order.
            # Deltas stay 4D (B, H, W, A*4): flattening them here would
            # relayout the whole tensor; proposal selection instead
            # gathers only the top-k rows post-top-k (see
            # select_proposals), and the training path reshapes lazily.
            logits_out.append(y[..., :a].reshape(b, -1))
            deltas_out.append(y[..., a:])
        return logits_out, deltas_out


def select_proposals(logits, deltas, anchors, image_size, *,
                     pre_nms_topk, post_nms_topk, nms_thresh,
                     min_box_size=0.0, approx_topk=False):
    """Single-image proposal selection -> (boxes (K,4), scores (K,), valid).

    logits: list of (n_l,) objectness logits per level;
    deltas: list of (H_l, W_l, A*4) conv outputs (row-major (y, x, a)
    order matching the logits/anchors) OR pre-flattened (n_l, 4);
    anchors: list of (n_l, 4) arrays.

    ``approx_topk`` selects the per-level pre-NMS candidates with
    jax.lax.approx_max_k (recall 0.99) instead of an exact top-k: the
    exact top-k lowers to full per-level sorts (~7.7 ms/batch-32 on v5e
    for p2's 182k anchors). Only the pre-NMS *candidate pool* is
    affected — missing ~1% of rank-~1000 objectness tails has no
    measurable effect downstream (the post-NMS top-k stays exact).
    """
    boxes_all, scores_all = [], []
    for lg, dl, an in zip(logits, deltas, anchors):
        n_l = lg.shape[0]
        k = min(pre_nms_topk, n_l)
        if approx_topk and k < n_l:
            vals, idx = jax.lax.approx_max_k(lg, k, recall_target=0.99)
        else:
            vals, idx = jax.lax.top_k(lg, k)
        if dl.ndim == 3:
            # gather just the k selected rows from the 4D conv output
            # (flattening all H*W*A rows first would relayout the tensor)
            h, w, a4 = dl.shape
            na = a4 // 4
            dsel = dl.reshape(h, w, na, 4)[
                idx // (w * na), (idx // na) % w, idx % na]
        else:
            dsel = dl[idx]
        b = box_ops.clip_boxes(box_ops.apply_deltas(dsel, an[idx]),
                               image_size)
        v = jnp.isfinite(vals) & box_ops.nonempty(b, min_box_size)
        # levels never suppress each other (torchvision batched_nms
        # semantics), so NMS runs per level on (k, k) matrices instead of
        # one (sum k)^2 matrix — ~5x less suppression work
        keep = nms_mask(b, vals, v, nms_thresh)
        boxes_all.append(b)
        scores_all.append(jnp.where(keep, vals, NEG_INF))
    boxes = jnp.concatenate(boxes_all)
    masked = jnp.concatenate(scores_all)

    k = min(post_nms_topk, masked.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked, k)
    out_valid = top_scores > NEG_INF / 2
    return boxes[top_idx], top_scores, out_valid


# ---------------------------------------------------------------------------
# training: anchor labeling + losses
# ---------------------------------------------------------------------------

def match_anchors_to_gt(anchors, gt_boxes, gt_valid, thresholds=(0.3, 0.7),
                        chunk=16384):
    """Label anchors against GT boxes (detectron2 Matcher semantics).

    Returns (matched_gt_idx (N,), labels (N,)) with labels in {-1 ignore,
    0 negative, 1 positive}; includes low-quality matches (anchors that are
    the best match of some GT get label 1).
    Memory: IoU is computed in anchor chunks; the full (N_anchors, N_gt)
    matrix never materializes.
    """
    n = anchors.shape[0]
    n_gt = gt_boxes.shape[0]
    lo, hi = thresholds

    pad = (-n) % chunk
    anchors_p = jnp.pad(anchors, ((0, pad), (0, 0)))
    anchors_c = anchors_p.reshape(-1, chunk, 4)

    def per_chunk(a):
        iou = box_ops.pairwise_iou(a, gt_boxes)           # (chunk, G)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        gt_best = jnp.max(iou, axis=0)                     # (G,)
        return best_gt, best_iou, gt_best, iou

    def scan_fn(carry, a):
        gt_best_acc = carry
        best_gt, best_iou, gt_best, _ = per_chunk(a)
        return jnp.maximum(gt_best_acc, gt_best), (best_gt, best_iou)

    gt_best_all, (best_gt, best_iou) = jax.lax.scan(
        scan_fn, jnp.full((n_gt,), -1.0), anchors_c)
    best_gt = best_gt.reshape(-1)[:n]
    best_iou = best_iou.reshape(-1)[:n]

    labels = jnp.where(best_iou >= hi, 1,
                       jnp.where(best_iou < lo, 0, -1))
    # low-quality matches: anchors achieving a GT's best IoU become positive
    def low_quality(a_chunk, bi_chunk, bg_chunk):
        iou = box_ops.pairwise_iou(a_chunk, gt_boxes)
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        is_best = (iou == gt_best_all[None, :]) & (iou > 0)
        return jnp.any(is_best, axis=1)

    lq = jax.lax.map(
        lambda a: low_quality(a, None, None), anchors_c).reshape(-1)[:n]
    labels = jnp.where(lq & (best_iou > 0), 1, labels)
    # anchors with no valid gt at all stay negative
    labels = jnp.where(jnp.any(gt_valid), labels, jnp.zeros_like(labels))
    return best_gt, labels


def subsample_labels(labels, num_samples, positive_fraction, key):
    """Randomly pick positives/negatives (fixed shapes, mask output).

    Returns float weights (N,): 1 for sampled anchors, 0 otherwise, matching
    detectron2 subsample_labels counts (up to num_samples*positive_fraction
    positives, rest negatives).
    """
    kpos, kneg = jax.random.split(key)
    num_pos_target = int(num_samples * positive_fraction)

    pos_mask = labels == 1
    neg_mask = labels == 0
    n_pos = jnp.sum(pos_mask)
    n_neg = jnp.sum(neg_mask)
    num_pos = jnp.minimum(n_pos, num_pos_target)
    num_neg = jnp.minimum(n_neg, num_samples - num_pos)

    def pick(mask, num, key):
        # random priorities; invalid entries sink
        r = jax.random.uniform(key, mask.shape)
        r = jnp.where(mask, r, 2.0)
        order = jnp.argsort(r)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(mask.shape[0]))
        return (rank < num) & mask

    sel_pos = pick(pos_mask, num_pos, kpos)
    sel_neg = pick(neg_mask, num_neg, kneg)
    return sel_pos, sel_neg


def rpn_losses(logits, deltas, anchors, gt_boxes, gt_valid, key, *,
               batch_size_per_image=256, positive_fraction=0.5,
               bbox_reg_weights=(1.0, 1.0, 1.0, 1.0)):
    """RPN objectness BCE + box L1 loss for one image.

    logits: (N,) concatenated over levels; deltas: (N, 4); anchors: (N, 4).
    Normalization matches detectron2: both losses divided by the number of
    sampled anchors (batch_size_per_image).
    """
    matched_idx, labels = match_anchors_to_gt(anchors, gt_boxes, gt_valid)
    sel_pos, sel_neg = subsample_labels(labels, batch_size_per_image,
                                        positive_fraction, key)
    sampled = sel_pos | sel_neg

    # objectness: BCE over sampled anchors
    target = (labels == 1).astype(jnp.float32)
    bce = optax_sigmoid_bce(logits, target)
    objectness_loss = jnp.sum(jnp.where(sampled, bce, 0.0))

    # box regression: L1 on positive anchors against matched GT deltas
    matched_gt = gt_boxes[matched_idx]
    target_deltas = box_ops.get_deltas(anchors, matched_gt, bbox_reg_weights)
    l1 = jnp.sum(jnp.abs(deltas - target_deltas), axis=-1)
    loc_loss = jnp.sum(jnp.where(sel_pos, l1, 0.0))

    normalizer = float(batch_size_per_image)
    return {"loss_rpn_cls": objectness_loss / normalizer,
            "loss_rpn_loc": loc_loss / normalizer}


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid binary cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
