"""Mask R-CNN (GeneralizedRCNN): R50-FPN backbone + RPN + ROI heads.

The flagship model: a from-scratch JAX/Flax rebuild of the network the
reference uses through detectron2 ('COCO-InstanceSegmentation/
mask_rcnn_R_50_FPN_3x.yaml', SURVEY.md §2b call stacks §3.2-3.3), designed
for TPU:

* NHWC, bf16 compute / fp32 params (configurable);
* every post-backbone stage is fixed-shape with validity masks — proposal
  count, detection count, and RoI batch never depend on data;
* RoIAlign over all images and FPN levels is ONE fused gather + ONE head
  call (B*K RoIs hit the MXU together);
* inference returns (boxes, scores, classes, 28x28 soft masks, valid) —
  full-resolution mask pasting + RLE encoding happens on host in C++
  (csrc/rle.cpp paste_masks_encode), so device->host traffic is ~KB per
  image instead of the reference's N x H x W bitmask stack.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import box_ops
from ..ops.roi_align import (assign_levels, crop_and_resize_masks,
                             crop_resize_instance_canvases,
                             pack_feature_levels, roi_align_packed)
from ..ops.roi_align_fused import concat_feature_levels, roi_align_windows
from .anchors import multilevel_anchors
from .fpn import FPN
from .resnet import ResNet
from .roi_heads import (BoxHead, MaskHead, box_head_losses,
                        fast_rcnn_inference, mask_head_loss,
                        sample_proposals)
from .rpn import RPNHead, rpn_losses, select_proposals

RPN_FEATURES = ("p2", "p3", "p4", "p5", "p6")
BOX_FEATURES = ("p2", "p3", "p4", "p5")
FPN_STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}


class MaskRCNN(nn.Module):
    """GeneralizedRCNN with a config bag of detectron2-compatible knobs."""
    num_classes: int = 1
    # anchors
    anchor_sizes: Sequence[Sequence[float]] = (
        (32,), (64,), (128,), (256,), (512,))
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    # rpn
    pre_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 1000
    post_nms_topk_train: int = 1000
    post_nms_topk_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    # roi heads
    box_pooler_resolution: int = 7
    mask_pooler_resolution: int = 14
    pooler_sampling_ratio: int = 0
    pooler_max_sr: int = 2
    roi_batch_per_image: int = 512
    roi_positive_fraction: float = 0.25
    roi_iou_thresh: float = 0.5
    bbox_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    mask_rois_per_image: int = 128
    # auxiliary mask boundary loss weight (0 = off): L2 Sobel edge
    # agreement, arXiv:1809.07069 (cfg.MODEL.ROI_MASK_HEAD.EDGE_AGREEMENT)
    edge_agreement: float = 0.0
    # Inference mask-stage capacity (cfg.TPU.MASK_CAPACITY_PER_IMAGE):
    # the detection stage keeps detections_per_image static slots per
    # image, but real workloads fill only ~50-70% of them (the shipped
    # reference predictions carry 197-277 detections against the 400
    # cap), so pooling + mask head on every slot wastes MXU/HBM on
    # padding. > 0 compacts the mask stage across the batch: the
    # B*capacity highest-priority slots (valid first, then score) are
    # pooled and masked, results scattered back. Outputs are IDENTICAL
    # to the uncompacted path unless the batch overflows capacity, in
    # which case the lowest-score valid detections get empty masks and
    # the overflow is reported in the returned "mask_dropped" count
    # (the reference's GPU path is fully dynamic — it only ever
    # computes masks for actual detections). 0 = off.
    mask_capacity_per_image: int = 0
    # backbone
    depth: int = 50
    # cfg.MODEL.RESNETS.NORM: "FrozenBN" (reference default; required for
    # converted d2 checkpoints) | "GN" (from-scratch training — see
    # models.layers.GroupNorm). Param tree is identical either way.
    backbone_norm: str = "FrozenBN"
    dtype: Any = jnp.float32
    roi_chunk: int = 256
    # window-DMA Pallas RoIAlign (exact for RoIs whose footprint on their
    # FPN level spans < roi_window px — see ops.roi_align_fused).
    # True forces the compiled Pallas path, False the portable gather
    # path, "auto" picks Pallas iff the default backend is TPU. Thread an
    # explicit value (cfg.TPU.USE_PALLAS via build_model) when tracing for
    # a non-default backend (AOT export, jit(..., backend=...)).
    fused_roi: Any = "auto"
    # Pallas interpret mode: "auto" = interpret off-TPU
    fused_interpret: Any = "auto"
    # 24 measured fastest on v5e: vs 32 it moves 40% less HBM per RoI and
    # 25% fewer DMA rows. Exact for footprints <= 22 px (canonical FPN
    # assignment keeps box spans under ~20 except aspect > ~1.5 outliers);
    # larger spans — including full-canvas boxes clipped to p5 (footprint
    # 42 -> 21 after demotion) — pool from the 2x-avgpooled copy.
    roi_window: int = 24
    # Fused mask-head tail (ops.mask_tail). Default OFF: numerically
    # exact and saves the (N, 28, 28, 256) HBM round trip, but measured
    # end-to-end ~4% slower than XLA's deconv on v5e (95.4 -> 91.2 img/s
    # at num_classes=1, where the 1x1 predictor matmul is a matrix-vector
    # product the MXU runs at 1/128 lane utilization inside the kernel,
    # while XLA folds it into the deconv epilogue).
    fused_mask_tail: bool = False
    # Winograd F(2x2, 3x3) Pallas kernel for the mask head's four 3x3
    # convs (ops.winograd): 2.25x fewer MXU multiplies, exact to bf16
    # rounding. Default OFF — measured 110.3 -> 83.2 img/s on the
    # flagship v5e bench: XLA's direct conv already runs ~99% MXU at
    # (12800, 14, 14, 256), and the VPU-side tile transforms (on 7x7
    # sublane-misaligned slices) cost more than the 44% MXU saving.
    # Inference-only (no VJP; training keeps the direct conv).
    # "auto" = on whenever the fused Pallas path is (i.e. on TPU).
    winograd_mask_head: Any = False
    # approx_max_k (recall 0.99) for the per-level pre-NMS candidate
    # selection at inference; training keeps the exact top-k (proposal
    # sampling feeds losses). Default OFF — measured ~3% slower
    # end-to-end on v5e (110.98 -> 107.8 img/s): the vmapped
    # approx_max_k lowering costs more here than the exact per-level
    # sorts it replaces. See rpn.select_proposals.
    approx_topk: bool = False
    # Symmetric int8 quantization for the mask-head convs + deconv at
    # inference (ops.quant): the v5e MXU runs int8 at 2x the bf16 rate
    # and the mask head is the largest MXU-bound stage (~82 ms/batch-32).
    # Modes: False (off) | True (dynamic per-tensor scales — measured
    # SLOWER end-to-end on v5e, the amax passes cost more than the MXU
    # saving) | "calib" (float forward recording activation scales into
    # the "quant" variable collection; apply with mutable=["quant"]) |
    # "static" (the fast path: calibrated scales, quantize fused into
    # conv epilogues). See docs/performance.md for measurements.
    int8_mask_head: Any = False
    # Symmetric int8 quantization of the res2-res5 backbone stages at
    # inference (models.resnet Bottleneck.int8): FrozenBN folds into the
    # quantized kernels, and the inter-conv/inter-block activations cross
    # HBM as int8 — the backbone is bandwidth-bound on v5e, so this
    # halves its dominant cost. Modes mirror int8_mask_head: False |
    # "calib" (float forward recording per-tensor scales into "quant") |
    # "static" (the fast path). FrozenBN models only; inference-only.
    int8_backbone: Any = False
    # int8 for the FPN lateral/output convs and the RPN head at inference
    # (same modes). With int8_backbone also "static", the FPN laterals
    # consume the backbone's int8 outputs directly and the res2-res5
    # feature maps never materialize in bf16.
    int8_neck: Any = False

    def setup(self):
        self.backbone_net = ResNet(depth=self.depth,
                                   norm_type=self.backbone_norm,
                                   dtype=self.dtype, name="backbone")
        self.fpn = FPN(dtype=self.dtype, name="fpn")
        self.rpn_head = RPNHead(num_anchors=len(self.anchor_ratios),
                                dtype=self.dtype, name="rpn")
        self.box_head = BoxHead(num_classes=self.num_classes,
                                dtype=self.dtype, name="box_head")
        self.mask_head = MaskHead(num_classes=self.num_classes,
                                  dtype=self.dtype, name="mask_head")

    # -- shared stages ------------------------------------------------------

    def backbone(self, images, int8=False, int8_neck=False):
        """(B, H, W, 3) normalized float -> dict of p2..p6 NHWC features.

        ``int8``/``int8_neck`` quantize res2-res5 / FPN (inference only —
        the training path always passes the defaults; see
        MaskRCNN.int8_backbone / int8_neck).
        """
        chain = int8 == "static" and int8_neck == "static"
        feats = self.backbone_net(images.astype(self.dtype), int8=int8,
                                  int8_outputs=chain)
        return self.fpn(feats, int8=int8_neck)

    def _anchors(self, feats):
        shapes = [feats[f].shape[1:3] for f in RPN_FEATURES]
        strides = [FPN_STRIDES[f] for f in RPN_FEATURES]
        return [jnp.asarray(a) for a in multilevel_anchors(
            shapes, strides, self.anchor_sizes, self.anchor_ratios)]

    def _rpn(self, feats, int8=False):
        logits, deltas = self.rpn_head([feats[f] for f in RPN_FEATURES],
                                       int8=int8)
        return logits, deltas

    def _propose(self, logits, deltas, anchors, image_sizes, train: bool):
        pre = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post = self.post_nms_topk_train if train else self.post_nms_topk_test

        def one(lg, dl, size):
            return select_proposals(list(lg), list(dl), anchors, size,
                                    pre_nms_topk=pre, post_nms_topk=post,
                                    nms_thresh=self.rpn_nms_thresh,
                                    approx_topk=self.approx_topk
                                    and not train)

        return jax.vmap(one)(tuple(logits), tuple(deltas), image_sizes)

    def _packed_features(self, feats, b):
        """Corner-pack the batch's box/mask pooling levels once.

        Per-image level lists are concatenated so RoIAlign over the whole
        batch is one gather; the packing (see ops.roi_align) is shared by
        the box and mask heads.
        """
        feature_list = [feats[f][i] for i in range(b) for f in BOX_FEATURES]
        strides = tuple(FPN_STRIDES[f] for f in BOX_FEATURES) * b
        return pack_feature_levels(feature_list), strides

    def _pool(self, packed, strides, boxes, valid, resolution,
              img_idx=None, batch=None):
        """RoIAlign (B, K, 4) boxes -> (B*K, P, P, C) in one fused gather.

        ``img_idx`` (flat (N,) int32) overrides the default (B, K) layout
        mapping — used by the compacted mask stage, whose RoIs are an
        arbitrary cross-batch selection.
        """
        n_lvl = len(BOX_FEATURES)
        flat_boxes = boxes.reshape(-1, 4)
        # keep gather indices in-range for padding rows
        flat_boxes = jnp.where(valid.reshape(-1, 1), flat_boxes, 0.0)
        levels = assign_levels(flat_boxes)
        if img_idx is None:
            b, k = boxes.shape[:2]
            img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        entries = img_idx * n_lvl + levels
        return roi_align_packed(
            packed, flat_boxes, entries, strides=strides,
            output_size=resolution, max_sr=self.pooler_max_sr,
            sampling_ratio=self.pooler_sampling_ratio, chunk=self.roi_chunk)

    def _pool_fused(self, pack, boxes, valid, resolution, trainable=False,
                    img_idx=None):
        """Window-DMA Pallas RoIAlign (TPU hot path; see ops.roi_align_fused).

        ``trainable`` uses the custom-VJP variant whose backward
        scatter-adds per-RoI window gradients into the feature plane.
        ``img_idx`` as in _pool.
        """
        flat = jnp.where(valid.reshape(-1, 1), boxes.reshape(-1, 4), 0.0)
        levels = assign_levels(flat)
        if img_idx is None:
            b, k = boxes.shape[:2]
            img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        strides = tuple(FPN_STRIDES[f] for f in BOX_FEATURES)
        return roi_align_windows(
            pack, flat, img_idx, levels, valid.reshape(-1),
            strides=strides, output_size=resolution,
            max_sr=self.pooler_max_sr, window=self.roi_window,
            interpret=self._fused_interpret(), trainable=trainable)

    def _use_fused(self):
        if self.fused_roi == "auto":
            return jax.default_backend() == "tpu"
        return bool(self.fused_roi)

    def _fused_interpret(self):
        if self.fused_interpret == "auto":
            return jax.default_backend() != "tpu"
        return bool(self.fused_interpret)

    def _use_winograd(self):
        if self.winograd_mask_head == "auto":
            return self._use_fused()
        return bool(self.winograd_mask_head)

    # -- inference ----------------------------------------------------------

    def inference(self, images, image_sizes):
        """Batched inference.

        images: (B, H, W, 3) normalized float (see input.transforms);
        image_sizes: (B, 2) float actual (h, w) extents within the canvas.
        Returns dict: boxes (B, D, 4) in resized coords, scores (B, D),
        classes (B, D) int32, masks (B, D, 2P, 2P) sigmoid probabilities for
        the predicted class, valid (B, D).
        """
        b = images.shape[0]
        feats = self.backbone(images, int8=self.int8_backbone,
                              int8_neck=self.int8_neck)
        logits, deltas = self._rpn(feats, int8=self.int8_neck)
        anchors = self._anchors(feats)
        proposals, _, prop_valid = self._propose(
            logits, deltas, anchors, image_sizes, train=False)
        k = proposals.shape[1]

        use_fused = self._use_fused()
        if use_fused:
            pack = concat_feature_levels(
                [feats[f] for f in BOX_FEATURES], window=self.roi_window)
            pooled = self._pool_fused(pack, proposals, prop_valid,
                                      self.box_pooler_resolution)
        else:
            packed, strides = self._packed_features(feats, b)
            pooled = self._pool(packed, strides, proposals, prop_valid,
                                self.box_pooler_resolution)
        cls_logits, box_deltas = self.box_head(pooled)     # (B*K, C+1/C*4)
        probs = jax.nn.softmax(cls_logits, axis=-1).reshape(
            b, k, self.num_classes + 1)
        reg_boxes = box_ops.apply_deltas(
            box_deltas, proposals.reshape(-1, 4),
            tuple(self.bbox_reg_weights)).reshape(
                b, k, self.num_classes, 4)

        def one(boxes_pc, scores, pv, size):
            return fast_rcnn_inference(
                boxes_pc, scores, pv, size,
                score_thresh=self.score_thresh, nms_thresh=self.nms_thresh,
                topk_per_image=self.detections_per_image)

        dets = jax.vmap(one)(reg_boxes, probs, prop_valid, image_sizes)

        d = dets["boxes"].shape[1]
        mcap = self.mask_capacity_per_image
        compact = bool(mcap) and mcap < d
        dropped = jnp.zeros((), jnp.int32)
        if compact:
            # batch-global compaction (see mask_capacity_per_image): pool
            # + mask-head only the B*mcap highest-priority slots
            m_total = b * mcap
            flat_valid = dets["valid"].reshape(-1)
            prio = jnp.where(flat_valid, dets["scores"].reshape(-1), -1.0)
            _, top_idx = jax.lax.top_k(prio, m_total)
            mask_boxes = dets["boxes"].reshape(-1, 4)[top_idx]
            mask_valid = flat_valid[top_idx]
            mask_classes = dets["classes"].reshape(-1)[top_idx]
            mask_img = (top_idx // d).astype(jnp.int32)
            dropped = (jnp.sum(flat_valid.astype(jnp.int32))
                       - jnp.sum(mask_valid.astype(jnp.int32)))
        else:
            mask_boxes, mask_valid = dets["boxes"], dets["valid"]
            mask_classes, mask_img = dets["classes"], None

        if use_fused:
            mask_pooled = self._pool_fused(pack, mask_boxes, mask_valid,
                                           self.mask_pooler_resolution,
                                           img_idx=mask_img)
        else:
            mask_pooled = self._pool(packed, strides, mask_boxes,
                                     mask_valid,
                                     self.mask_pooler_resolution,
                                     img_idx=mask_img)
        mask_logits = self.mask_head(
            mask_pooled, fused_tail=use_fused and self.fused_mask_tail,
            interpret=self._fused_interpret(),
            winograd=self._use_winograd(),
            int8=self.int8_mask_head)                      # (N, 2P, 2P, C)
        mp = mask_logits.shape[1]
        if self.num_classes == 1:
            # single-class: the per-RoI class gather is a squeeze (the
            # general take_along_axis cost 3 ms/batch-32 on v5e here)
            sel = mask_logits[..., 0]
        else:
            cls = jnp.clip(mask_classes.reshape(-1), 0,
                           self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_logits, cls[:, None, None, None], axis=3)[..., 0]
        sel = jax.nn.sigmoid(sel)
        if compact:
            masks = jnp.zeros((b * d, mp, mp), sel.dtype)
            masks = masks.at[top_idx].set(sel).reshape(b, d, mp, mp)
        else:
            masks = sel.reshape(b, d, mp, mp)

        return {"boxes": dets["boxes"], "scores": dets["scores"],
                "classes": dets["classes"], "masks": masks,
                "valid": dets["valid"], "mask_dropped": dropped}

    def __call__(self, images, image_sizes):
        return self.inference(images, image_sizes)

    # -- training -----------------------------------------------------------

    def losses(self, images, image_sizes, gt_boxes, gt_classes, gt_valid,
               gt_masks, rng, gt_mask_meta=None):
        """Training losses for a batch.

        gt_boxes: (B, G, 4) XYXY in resized coords; gt_classes: (B, G);
        gt_valid: (B, G) bool. GT masks come in one of two forms:

        * gt_mask_meta is None: gt_masks is a dense (B, G, H, W) uint8
          stack at the resized canvas resolution (reference-style);
        * gt_mask_meta (B, G, 4): gt_masks is (B, G, T, T) uint8
          per-instance crop canvases with affine maps back to image
          coords (the TPU-native form — ~60x less host->device traffic
          for high-instance-density workloads; see
          ops.roi_align.instance_mask_canvas).

        Returns the detectron2-named loss dict.
        """
        b = images.shape[0]
        feats = self.backbone(images)
        logits, deltas = self._rpn(feats)
        anchors = self._anchors(feats)
        anchors_cat = jnp.concatenate(anchors, axis=0)

        rngs = jax.random.split(rng, b * 2).reshape(b, 2, -1)

        # --- RPN losses (per image, vmapped) ---
        def rpn_one(lg, dl, gtb, gtv, key):
            return rpn_losses(
                jnp.concatenate(list(lg)),
                jnp.concatenate([d.reshape(-1, 4) for d in dl]),
                anchors_cat, gtb, gtv, key,
                batch_size_per_image=self.rpn_batch_per_image,
                positive_fraction=self.rpn_positive_fraction)

        rpn_loss = jax.vmap(rpn_one)(tuple(logits), tuple(deltas), gt_boxes,
                                     gt_valid, rngs[:, 0])

        # --- proposals + sampling ---
        proposals, _, prop_valid = self._propose(
            logits, deltas, anchors, image_sizes, train=True)
        proposals = jax.lax.stop_gradient(proposals)

        def sample_one(props, pv, gtb, gtc, gtv, key):
            return sample_proposals(
                props, pv, gtb, gtc, gtv, key,
                batch_size_per_image=self.roi_batch_per_image,
                positive_fraction=self.roi_positive_fraction,
                iou_thresh=self.roi_iou_thresh,
                num_classes=self.num_classes)

        sampled = jax.vmap(sample_one)(proposals, prop_valid, gt_boxes,
                                       gt_classes, gt_valid, rngs[:, 1])

        # --- box head ---
        s = self.roi_batch_per_image
        use_fused = self._use_fused()
        if use_fused:
            pack = concat_feature_levels(
                [feats[f] for f in BOX_FEATURES], window=self.roi_window)
            pooled = self._pool_fused(pack, sampled["boxes"],
                                      sampled["valid"],
                                      self.box_pooler_resolution,
                                      trainable=True)
        else:
            packed, strides = self._packed_features(feats, b)
            pooled = self._pool(packed, strides, sampled["boxes"],
                                sampled["valid"],
                                self.box_pooler_resolution)
        cls_logits, box_deltas = self.box_head(pooled)

        def box_loss_one(cl, bd, smp, gtb):
            return box_head_losses(
                cl, bd, smp, gtb,
                bbox_reg_weights=tuple(self.bbox_reg_weights),
                num_classes=self.num_classes)

        box_loss = jax.vmap(box_loss_one)(
            cls_logits.reshape(b, s, -1), box_deltas.reshape(b, s, -1),
            sampled, gt_boxes)

        # --- mask head on the foreground subset ---
        m = min(self.mask_rois_per_image, s)

        def fg_subset(smp):
            prio = jnp.where(smp["is_fg"], 0.0, 1.0) \
                + jnp.arange(s) * 1e-6
            idx = jnp.argsort(prio)[:m]
            return {
                "boxes": smp["boxes"][idx],
                "matched_gt": smp["matched_gt"][idx],
                "classes": smp["classes"][idx],
                "valid": smp["is_fg"][idx],
            }

        fg = jax.vmap(fg_subset)(sampled)
        if use_fused:
            mask_pooled = self._pool_fused(pack, fg["boxes"], fg["valid"],
                                           self.mask_pooler_resolution,
                                           trainable=True)
        else:
            mask_pooled = self._pool(packed, strides, fg["boxes"],
                                     fg["valid"],
                                     self.mask_pooler_resolution)
        mask_logits = self.mask_head(mask_pooled)
        out_res = mask_logits.shape[1]

        if gt_mask_meta is not None:
            def targets_one(canv_g, meta_g, boxes_m, idx_m, size):
                t = crop_resize_instance_canvases(
                    canv_g, meta_g, boxes_m, idx_m, size,
                    output_size=out_res, max_sr=self.pooler_max_sr)
                return (t >= 0.5).astype(jnp.float32)

            mask_targets = jax.vmap(targets_one)(
                gt_masks, gt_mask_meta, fg["boxes"], fg["matched_gt"],
                image_sizes)
        else:
            def targets_one(masks_g, boxes_m, idx_m):
                t = crop_and_resize_masks(masks_g, boxes_m, idx_m,
                                          output_size=out_res,
                                          max_sr=self.pooler_max_sr)
                return (t >= 0.5).astype(jnp.float32)

            mask_targets = jax.vmap(targets_one)(
                gt_masks, fg["boxes"], fg["matched_gt"])

        def mask_loss_one(ml, mt, cls, val):
            return mask_head_loss(ml, mt, cls, val)

        ml_per_img = mask_logits.reshape(b, m, out_res, out_res, -1)
        loss_mask = jax.vmap(mask_loss_one)(
            ml_per_img, mask_targets, fg["classes"], fg["valid"])

        losses = {
            "loss_rpn_cls": jnp.mean(rpn_loss["loss_rpn_cls"]),
            "loss_rpn_loc": jnp.mean(rpn_loss["loss_rpn_loc"]),
            "loss_cls": jnp.mean(box_loss["loss_cls"]),
            "loss_box_reg": jnp.mean(box_loss["loss_box_reg"]),
            "loss_mask": jnp.mean(loss_mask),
        }
        if self.edge_agreement:
            from .roi_heads import edge_agreement_loss
            loss_edge = jax.vmap(edge_agreement_loss)(
                ml_per_img, mask_targets, fg["classes"], fg["valid"])
            losses["loss_mask_edge"] = (jnp.mean(loss_edge)
                                        * self.edge_agreement)
        return losses


def _check_int8_backbone(mode, norm_type):
    """int8 backbone folds the norm {scale, bias} into the conv kernel,
    which is only an identity transform for FrozenBN — with GN the
    runtime normalization would be silently skipped and the features
    garbage, so refuse instead."""
    if mode and norm_type != "FrozenBN":
        raise ValueError(
            f"cfg.TPU.INT8_BACKBONE={mode!r} requires "
            f"cfg.MODEL.RESNETS.NORM='FrozenBN' (got {norm_type!r}): "
            f"ConvBNInt8 folds the norm affine into the conv kernel, "
            f"which cannot express GroupNorm's runtime statistics")
    return mode


def build_model(cfg) -> MaskRCNN:
    """Construct a MaskRCNN from a CfgNode (ampis_tpu.engine.config)."""
    dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
             else jnp.float32)
    return MaskRCNN(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        anchor_sizes=tuple(tuple(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES),
        anchor_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
        pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
        pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
        post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
        post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        rpn_batch_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
        box_pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        roi_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        roi_iou_thresh=cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS[0],
        bbox_reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        depth=cfg.MODEL.RESNETS.DEPTH,
        backbone_norm=cfg.MODEL.RESNETS.NORM,
        dtype=dtype,
        # USE_PALLAS: True = auto-detect (Pallas on TPU), False = portable
        # gather path everywhere, "force" = Pallas even off-TPU
        fused_roi=("auto" if cfg.TPU.USE_PALLAS is True
                   else True if cfg.TPU.USE_PALLAS == "force"
                   else False),
        # bool or "calib"/"static"/"dynamic" (see MaskRCNN.int8_mask_head)
        int8_mask_head=getattr(cfg.TPU, "INT8_MASK_HEAD", False),
        int8_backbone=_check_int8_backbone(
            getattr(cfg.TPU, "INT8_BACKBONE", False),
            cfg.MODEL.RESNETS.NORM),
        int8_neck=getattr(cfg.TPU, "INT8_NECK", False),
        mask_capacity_per_image=getattr(
            cfg.TPU, "MASK_CAPACITY_PER_IMAGE", 0) or 0,
        edge_agreement=float(getattr(cfg.MODEL.ROI_MASK_HEAD,
                                     "EDGE_AGREEMENT", 0.0) or 0.0),
    )


def init_params(model: MaskRCNN, rng, canvas=(64, 64)):
    """Initialize parameters with a tiny dummy canvas (shape-independent)."""
    images = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    sizes = jnp.asarray([[canvas[0], canvas[1]]], jnp.float32)
    return jax.jit(lambda r: model.init(r, images, sizes,
                                        method=MaskRCNN.inference))(rng)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
