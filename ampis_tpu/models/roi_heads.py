"""ROI heads: box head (2xFC), mask head (4 conv + deconv), inference
filtering, and training-time sampling + losses.

Reference model dependency (SURVEY.md §2b): StandardROIHeads with 7x7
RoIAlignV2 box pooling on P2-P5, softmax classification (+background),
class-specific box regression (weights 10/10/5/5), per-class NMS 0.5 at
score threshold 0.05 capped at TEST.DETECTIONS_PER_IMAGE; 14x14 mask
pooling and a 28x28 per-class sigmoid mask head. Training samples 512
RoIs/image at 25% positive against IoU-0.5 matching with GT boxes appended
to the proposals.

TPU-first: fixed candidate/detection/RoI counts with validity masks;
per-class candidates are flattened and pre-topk'd so the NMS matrix stays
bounded regardless of NUM_CLASSES.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import box_ops
from ..ops.mask_tail import mask_head_tail
from ..ops.quant import (conv2d_int8, conv_transpose2x2_int8,
                         deconv_predictor_int8)
from ..ops.winograd import conv3x3_winograd
from ..ops.nms import NEG_INF, batched_nms_mask
from .rpn import optax_sigmoid_bce, subsample_labels


class _ConvParams(nn.Module):
    """Bare kernel+bias params (mirrors nn.Conv/nn.ConvTranspose layout,
    names, and default inits) for layers whose compute is applied manually.
    """
    kshape: Any

    @nn.compact
    def __call__(self):
        shape = tuple(self.kshape)
        k = self.param("kernel", nn.initializers.lecun_normal(), shape,
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (shape[-1],),
                       jnp.float32)
        return k, b


class _DenseParams(nn.Module):
    """Bare kernel+bias params mirroring nn.Dense's names/inits/layout."""
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.out_dim), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                       jnp.float32)
        return k, b


class BoxHead(nn.Module):
    """Flatten -> FC 1024 -> FC 1024 -> (cls score, box deltas).

    fc1 is computed as a PxP VALID convolution over the pooled NHWC tile
    instead of flatten+matmul: same arithmetic (the (P*P*C, fc_dim)
    weight reshaped HWIO indexes (y, x, c) exactly like the row-major
    flatten), but XLA's conv reads the pooled tensor's tiled layout
    directly — the flatten forced a full (N, P, P, C) relayout copy
    (~2.7 ms at batch 32) between the RoIAlign kernel and the matmul.
    The parameter stays fc1/kernel (P*P*C, fc_dim) so checkpoints and
    the d2 converter (engine/checkpoint.py fc1 flatten-order handling)
    are unaffected.
    """
    num_classes: int
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, P, P, C)
        n, p, _, c = x.shape
        k1, b1 = _DenseParams(p * p * c, self.fc_dim, name="fc1")()
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k1.reshape(p, p, c, self.fc_dim).astype(self.dtype),
            (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.relu(y.reshape(n, self.fc_dim) + b1.astype(self.dtype))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    """4x conv3x3(256) + relu -> deconv2x2/2 + relu -> 1x1 -> class masks."""
    num_classes: int
    conv_dim: int = 256
    num_conv: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fused_tail=False, interpret=False,
                 winograd=False, int8=False):
        """``fused_tail`` runs the deconv+relu+predictor tail as one Pallas
        kernel (ops.mask_tail) that never materializes the (N, 2P, 2P, 256)
        activation in HBM — inference hot path on TPU. ``winograd`` runs
        the four 3x3 convs with the F(2x2, 3x3) Pallas kernel
        (ops.winograd): 2.25x fewer MXU multiplies than the direct conv,
        which already runs at ~99% MXU utilization at this shape.
        ``int8`` runs the convs + deconv with symmetric int8
        quantization (ops.quant): 2x MXU rate and half the activation
        HBM traffic on v5e+, ~0.5% logit error. Modes: ``True`` =
        dynamic per-tensor scales (an amax pass per layer — measured
        slower end-to-end than bf16 on v5e, kept for reference);
        ``"static"`` = scales read from the ``quant`` variable
        collection, quantize/requantize fused into the conv epilogues
        (the fast path); ``"calib"`` = float forward that records
        running-max activation scales into ``quant`` (apply with
        ``mutable=["quant"]``, then rebind for "static"). All paths
        share the same parameters (mask_fcn{i}/{kernel,bias});
        winograd/int8 are inference-only (no VJP)."""
        if int8 == "dynamic":
            int8 = True
        calib, static = int8 == "calib", int8 == "static"
        if calib or static:
            assert not fused_tail, "int8 static excludes fused_tail"
            # one activation scale per conv input + the deconv input,
            # populated by a "calib" pass (like BatchNorm statistics)
            svars = [self.variable("quant", f"act_scale{i}",
                                   lambda: jnp.zeros((), jnp.float32))
                     for i in range(self.num_conv + 1)]
            # floor guards an un-calibrated (all-zero) collection
            scales = [jnp.maximum(v.value, 1e-8) for v in svars]
        x = x.astype(self.dtype)
        for i in range(self.num_conv):
            kc, bc = _ConvParams((3, 3, x.shape[-1], self.conv_dim),
                                 name=f"mask_fcn{i + 1}")()
            if calib:
                svars[i].value = jnp.maximum(
                    svars[i].value,
                    jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0)
            if static:
                x = conv2d_int8(x, kc, bc, relu=True, sx=scales[i],
                                out_scale=scales[i + 1])
            elif int8 is True:
                x = conv2d_int8(x, kc, bc, relu=True)
            elif winograd:
                x = conv3x3_winograd(x, kc, bc, relu=True, group=4,
                                     interpret=interpret)
            else:
                x = jax.lax.conv_general_dilated(
                    x, kc.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = nn.relu(x + bc.astype(self.dtype))
        kd, bd = _ConvParams((2, 2, self.conv_dim, self.conv_dim),
                             name="deconv")()
        kp, bp = _ConvParams((1, 1, self.conv_dim, self.num_classes),
                             name="predictor")()
        if fused_tail:
            return mask_head_tail(x, kd, bd, kp, bp, interpret=interpret)
        if calib:
            svars[-1].value = jnp.maximum(
                svars[-1].value,
                jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0)
        if static:
            # deconv + relu + predictor in one pass, predictor folded
            # into each int8 phase (ops.quant.deconv_predictor_int8)
            return deconv_predictor_int8(x, kd, bd, kp, bp,
                                         sx=scales[-1])
        if int8 is True:
            y = conv_transpose2x2_int8(x, kd, bd, relu=True)
        else:
            y = jax.lax.conv_transpose(
                x, kd.astype(self.dtype), strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(y + bd.astype(self.dtype))
        z = jnp.dot(y, kp.reshape(self.conv_dim, -1).astype(self.dtype))
        z = z + bp.astype(self.dtype)
        return z.astype(jnp.float32)  # logits (N, 2P, 2P, C)


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------

def fast_rcnn_inference(boxes_per_class, scores, proposal_valid, image_size,
                        *, score_thresh, nms_thresh, topk_per_image,
                        nms_candidates=1000):
    """Filter + classwise NMS + top-k (fixed shapes).

    boxes_per_class: (K, C, 4) class-specific regressed boxes;
    scores: (K, C+1) softmax probabilities (background last).
    Returns dict with (D,) arrays: boxes (D, 4), scores, classes, valid,
    where D = topk_per_image.
    """
    k, c = scores.shape[0], scores.shape[1] - 1
    fg_scores = scores[:, :c]                        # (K, C)
    boxes = box_ops.clip_boxes(boxes_per_class, image_size)  # (K, C, 4)

    flat_scores = fg_scores.reshape(-1)              # (K*C,)
    flat_boxes = boxes.reshape(-1, 4)
    flat_class = jnp.tile(jnp.arange(c, dtype=jnp.int32), (k,))
    flat_valid = (flat_scores > score_thresh) \
        & jnp.repeat(proposal_valid, c)

    # bound the NMS problem size
    n_cand = min(nms_candidates, flat_scores.shape[0])
    masked = jnp.where(flat_valid, flat_scores, NEG_INF)
    cand_scores, cand_idx = jax.lax.top_k(masked, n_cand)
    cand_boxes = flat_boxes[cand_idx]
    cand_class = flat_class[cand_idx]
    cand_valid = cand_scores > NEG_INF / 2

    keep = batched_nms_mask(cand_boxes, cand_scores, cand_class, cand_valid,
                            nms_thresh)
    kept_scores = jnp.where(keep, cand_scores, NEG_INF)
    d = min(topk_per_image, n_cand)
    out_scores, out_idx = jax.lax.top_k(kept_scores, d)
    out_valid = out_scores > NEG_INF / 2
    return {
        "boxes": cand_boxes[out_idx],
        "scores": jnp.where(out_valid, out_scores, 0.0),
        "classes": cand_class[out_idx],
        "valid": out_valid,
    }


# ---------------------------------------------------------------------------
# training: proposal sampling + losses
# ---------------------------------------------------------------------------

def sample_proposals(proposals, proposal_valid, gt_boxes, gt_classes,
                     gt_valid, key, *, batch_size_per_image=512,
                     positive_fraction=0.25, iou_thresh=0.5,
                     num_classes=1):
    """Match proposals (with GT appended) to GT and sample a fixed batch.

    Returns dict with fixed-size (S,) arrays where S = batch_size_per_image:
    boxes, matched_gt, classes (num_classes = background), is_fg, valid.
    """
    # append gt to proposals (detectron2 add_ground_truth_to_proposals)
    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)

    iou = box_ops.pairwise_iou(all_boxes, gt_boxes)       # (P+G, G)
    iou = jnp.where(gt_valid[None, :] & all_valid[:, None], iou, -1.0)
    matched = jnp.argmax(iou, axis=1)
    matched_iou = jnp.max(iou, axis=1)

    has_gt = jnp.any(gt_valid)
    fg = (matched_iou >= iou_thresh) & all_valid & has_gt
    bg = (matched_iou < iou_thresh) & all_valid

    labels = jnp.where(fg, 1, jnp.where(bg, 0, -1))
    sel_pos, sel_neg = subsample_labels(labels, batch_size_per_image,
                                        positive_fraction, key)
    sampled = sel_pos | sel_neg

    # gather a fixed-size batch: positives first, then negatives
    s = batch_size_per_image
    prio = jnp.where(sel_pos, 0, jnp.where(sel_neg, 1, 2))
    order = jnp.argsort(prio.astype(jnp.float32)
                        + jnp.arange(prio.shape[0]) * 1e-6)
    idx = order[:s]
    out_valid = sampled[idx]
    out_fg = sel_pos[idx]
    m = matched[idx]
    classes = jnp.where(out_fg, gt_classes[m], num_classes)  # bg = C
    return {
        "boxes": all_boxes[idx],
        "matched_gt": m,
        "classes": jnp.where(out_valid, classes, num_classes),
        "is_fg": out_fg & out_valid,
        "valid": out_valid,
    }


def box_head_losses(cls_logits, box_deltas, sampled, gt_boxes, *,
                    bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
                    num_classes=1):
    """Softmax CE + class-specific box L1 (detectron2 normalization)."""
    s = cls_logits.shape[0]
    valid = sampled["valid"]
    classes = sampled["classes"]

    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, classes[:, None], axis=1)[:, 0]
    loss_cls = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)

    # box regression on foreground only, class-specific deltas
    matched_gt_boxes = gt_boxes[sampled["matched_gt"]]
    target = box_ops.get_deltas(sampled["boxes"], matched_gt_boxes,
                                bbox_reg_weights)
    d = box_deltas.reshape(s, num_classes, 4)
    cls_idx = jnp.clip(classes, 0, num_classes - 1)
    pred = jnp.take_along_axis(d, cls_idx[:, None, None].repeat(4, axis=2),
                               axis=1)[:, 0]
    l1 = jnp.sum(jnp.abs(pred - target), axis=-1)
    loss_box = jnp.sum(jnp.where(sampled["is_fg"], l1, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def mask_head_loss(mask_logits, mask_targets, fg_classes, fg_valid):
    """Per-class sigmoid BCE over 28x28 mask targets.

    mask_logits: (M, 2P, 2P, C); mask_targets: (M, 2P, 2P) float 0/1;
    fg_classes: (M,) class index per RoI; fg_valid: (M,) bool.
    """
    m = mask_logits.shape[0]
    c = mask_logits.shape[-1]
    cls = jnp.clip(fg_classes, 0, c - 1)
    logits = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=3)[..., 0]
    bce = optax_sigmoid_bce(logits, mask_targets)
    per_roi = jnp.mean(bce, axis=(1, 2))
    return jnp.sum(jnp.where(fg_valid, per_roi, 0.0)) / jnp.maximum(
        jnp.sum(fg_valid), 1)


def _sobel_maps(x):
    """(M, S, S) -> (M, S-2, S-2, 2) Sobel gradient maps.

    VALID padding: zero-padding a constant map would fabricate border
    edges that leak into the loss; the interior is what boundary
    agreement is about.
    """
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0],
                      [-1.0, 0.0, 1.0]], x.dtype)
    k = jnp.stack([kx, kx.T], axis=-1)[:, :, None, :]  # (3, 3, 1, 2)
    return jax.lax.conv_general_dilated(
        x[..., None], k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def edge_agreement_loss(mask_logits, mask_targets, fg_classes, fg_valid):
    """Auxiliary mask boundary loss (Zimmermann & Siems 2018, "Faster
    Training of Mask R-CNN by Focusing on Instance Boundaries",
    arXiv:1809.07069): L2 between Sobel edge maps of the predicted mask
    probabilities and of the ground-truth mask. Sharpens mask boundaries
    and speeds mask-head convergence; weighted into loss_mask via
    cfg.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT.
    """
    c = mask_logits.shape[-1]
    cls = jnp.clip(fg_classes, 0, c - 1)
    logits = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=3)[..., 0]
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    diff = _sobel_maps(probs) - _sobel_maps(
        mask_targets.astype(jnp.float32))
    per_roi = jnp.mean(jnp.square(diff), axis=(1, 2, 3))
    return jnp.sum(jnp.where(fg_valid, per_roi, 0.0)) / jnp.maximum(
        jnp.sum(fg_valid), 1)
