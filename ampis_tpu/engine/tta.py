"""Test-time augmentation: flip + multi-scale inference with NMS merging.

Analogue of detectron2's GeneralizedRCNNWithTTA (which the reference
inherits but its tutorial never enables) rebuilt for this predictor's
output contract: every augmented view returns boxes in ORIGINAL image
coordinates plus low-res soft mask crops (structures.SoftMasks), so
inverting a view is a pure host-side coordinate flip — no re-running the
mask head, no dense mask resampling. Detections from all views are
concatenated and merged by classwise greedy NMS; each surviving
detection keeps its own view's mask.

Each distinct test scale compiles one extra inference graph (cached by
shape in DefaultPredictor); flips reuse the same graph.
"""
from __future__ import annotations

import numpy as np

from ..structures import Instances, SoftMasks
from .predictor import DefaultPredictor


def greedy_nms(boxes, scores, iou_threshold):
    """Host-side greedy NMS. boxes (N, 4) XYXY, scores (N,).

    Returns kept indices in descending score order (torchvision
    semantics: suppress when IoU > threshold).
    """
    order = np.argsort(-scores, kind="stable")
    x0, y0, x1, y1 = boxes.T
    areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iw = np.maximum(
            np.minimum(x1[i], x1[rest]) - np.maximum(x0[i], x0[rest]), 0)
        ih = np.maximum(
            np.minimum(y1[i], y1[rest]) - np.maximum(y0[i], y0[rest]), 0)
        inter = iw * ih
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def _resample_crop(mask, src_box, dst_box):
    """Resample an (mh, mw) soft crop defined over src_box onto the
    same-resolution grid over dst_box.

    Uses the paste convention (ops/paste.py: grid cell k's center sits at
    box0 + (k+0.5)*extent/m, torch grid_sample align_corners=False);
    samples outside the source box are 0. Pure numpy — voting clusters
    are tiny (~#views members) so this never needs the device.
    """
    mh, mw = mask.shape
    sx0, sy0, sx1, sy1 = src_box
    dx0, dy0, dx1, dy1 = dst_box
    us = dx0 + (np.arange(mw, dtype=np.float32) + 0.5) \
        * max(dx1 - dx0, 1e-9) / mw
    vs = dy0 + (np.arange(mh, dtype=np.float32) + 0.5) \
        * max(dy1 - dy0, 1e-9) / mh
    fx = (us - sx0) / max(sx1 - sx0, 1e-9) * mw - 0.5
    fy = (vs - sy0) / max(sy1 - sy0, 1e-9) * mh - 0.5

    def axis(f, size):
        lo = np.floor(f).astype(np.int64)
        frac = (f - lo).astype(np.float32)
        ok0 = (lo >= 0) & (lo < size)
        ok1 = (lo + 1 >= 0) & (lo + 1 < size)
        return (np.clip(lo, 0, size - 1), np.clip(lo + 1, 0, size - 1),
                frac, ok0, ok1)

    y0, y1, wy, oy0, oy1 = axis(fy, mh)
    x0, x1, wx, ox0, ox1 = axis(fx, mw)
    r0 = mask[y0] * oy0[:, None]
    r1 = mask[y1] * oy1[:, None]
    rows = r0 * (1 - wy)[:, None] + r1 * wy[:, None]
    c0 = rows[:, x0] * ox0[None, :]
    c1 = rows[:, x1] * ox1[None, :]
    return c0 * (1 - wx)[None, :] + c1 * wx[None, :]


def vote_merge(boxes, scores, masks, keep, vote_iou, n_views=0):
    """Score-weighted box + mask voting over each kept detection's cluster.

    For every kept index i, the cluster is all candidates whose IoU with
    box i is >= vote_iou (boxes must already be class-offset so clusters
    never cross classes). The merged box is the score-weighted mean of
    cluster boxes; the merged soft mask is the score-weighted mean of the
    cluster's crops resampled onto the merged box. NMS alone keeps one
    view's geometry per detection — voting pools the localization evidence
    of all ~#views redundant detections of the same object.

    Returns (voted_boxes (K, 4), voted_masks (K, mh, mw),
    voted_scores (K,)). voted_scores follows Weighted Boxes Fusion
    (Solovyev et al. 2021): the cluster's mean member score scaled by
    min(1, members / n_views) — a detection confirmed by every view keeps
    its mean score, a single-view detection is demoted proportionally,
    which ranks multi-view-confirmed objects above one-view strays.
    With n_views=0 the scale is skipped and voted_scores is just the
    cluster mean.
    """
    kb = boxes[keep]                                   # (K, 4)
    x0, y0, x1, y1 = boxes.T
    areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    iw = np.maximum(np.minimum(kb[:, 2:3], x1[None, :])
                    - np.maximum(kb[:, 0:1], x0[None, :]), 0)
    ih = np.maximum(np.minimum(kb[:, 3:4], y1[None, :])
                    - np.maximum(kb[:, 1:2], y0[None, :]), 0)
    inter = iw * ih                                    # (K, N)
    karea = np.maximum(kb[:, 2] - kb[:, 0], 0) \
        * np.maximum(kb[:, 3] - kb[:, 1], 0)
    iou = inter / np.maximum(karea[:, None] + areas[None, :] - inter, 1e-9)
    w = scores[None, :] * (iou >= vote_iou)            # (K, N)
    wsum = np.maximum(w.sum(axis=1, keepdims=True), 1e-9)
    voted_boxes = (w @ boxes) / wsum                   # (K, 4)

    voted_masks = np.empty((len(keep),) + masks.shape[1:], np.float32)
    voted_scores = np.empty(len(keep), np.float32)
    for r, i in enumerate(keep):
        members = np.nonzero(w[r])[0]
        if members.size == 0:
            members = np.asarray([i])
        acc = np.zeros(masks.shape[1:], np.float32)
        for j in members:
            acc += w[r, j] * _resample_crop(masks[j], boxes[j],
                                            voted_boxes[r])
        voted_masks[r] = acc / wsum[r, 0]
        voted_scores[r] = scores[members].mean() * (
            min(1.0, members.size / n_views) if n_views else 1.0)
    return voted_boxes, voted_masks, voted_scores


class TTAPredictor:
    """DefaultPredictor wrapper producing merged multi-view predictions.

    Parameters
    ----------
    cfg: CfgNode — predictor config (cfg.TEST.AUG-style knobs inline).
    min_sizes: test scales (shortest-edge targets); default: just
        cfg.INPUT.MIN_SIZE_TEST.
    flip: add a horizontally flipped view of every scale.
    vflip: also add vertically flipped views (microscopy images are
        orientation-free; detectron2's TTA only flips horizontally).
    rot90: also run every flip combination on the 90°-rotated image —
        with flip+vflip this completes the dihedral group D4 (all 8
        axis-aligned symmetries), the remaining diversity axis flips
        alone cannot reach. Non-square images compile one extra graph
        per scale (the rotated view swaps H and W).
    nms_thresh: merge NMS IoU; default cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST.
    vote_iou: if > 0, replace each surviving detection's box/mask with the
        score-weighted vote of its cluster (all candidates at IoU >=
        vote_iou) instead of keeping only the top view's geometry.
    score_mode: 'max' (default) keeps each survivor's top-view score;
        'wbf' (requires vote_iou > 0) replaces it with the
        Weighted-Boxes-Fusion score — cluster mean scaled by
        min(1, members/views) — and re-sorts, so detections confirmed by
        many views outrank single-view strays.
    extra_predictors: additional predictors (e.g. other checkpoints of the
        same class) whose views join the same merge — a checkpoint/model
        ensemble through the identical NMS/voting machinery.
    """

    def __init__(self, cfg, min_sizes=None, flip=True, vflip=False,
                 rot90=False, nms_thresh=None, predictor=None,
                 vote_iou=0.0, extra_predictors=(), score_mode="max"):
        self.predictor = predictor or DefaultPredictor(cfg)
        self.extra_predictors = list(extra_predictors)
        self.cfg = self.predictor.cfg
        self.min_sizes = [int(s) for s in
                          (min_sizes or [cfg.INPUT.MIN_SIZE_TEST])]
        self.flips = [(False, False)]
        if flip:
            self.flips.append((True, False))
        if vflip:
            self.flips += [(False, True)] + ([(True, True)] if flip else [])
        self.rots = [0, 1] if rot90 else [0]
        self.nms_thresh = float(nms_thresh
                                if nms_thresh is not None
                                else cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST)
        self.max_dets = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.vote_iou = float(vote_iou)
        if score_mode not in ("max", "wbf"):
            raise ValueError(f"score_mode {score_mode!r}: 'max' or 'wbf'")
        if score_mode == "wbf" and not self.vote_iou:
            raise ValueError("score_mode='wbf' requires vote_iou > 0 "
                             "(scores are defined over vote clusters)")
        self.score_mode = score_mode

    def __call__(self, original_image: np.ndarray):
        h0, w0 = original_image.shape[:2]
        boxes, scores, classes, masks = [], [], [], []
        predictors = [self.predictor] + self.extra_predictors
        saved_sizes = [p.cfg.INPUT.MIN_SIZE_TEST for p in predictors]
        try:
            for ms in self.min_sizes:
                # per-scale resize target; DefaultPredictor's per-shape
                # compile cache turns each distinct scale into one graph
                for p in predictors:
                    p.cfg.INPUT.MIN_SIZE_TEST = ms
                for rk in self.rots:
                    # np.rot90(img): view[v, u] = img[u, w0-1-v], so a
                    # view point (u, v) sits at original (w0 - v, u)
                    base = (np.rot90(original_image) if rk
                            else original_image)
                    vh, vw = base.shape[:2]
                    for fh, fv in self.flips:
                        view = base
                        if fh:
                            view = view[:, ::-1]
                        if fv:
                            view = view[::-1]
                        view = np.ascontiguousarray(view)
                        for p in predictors:
                            inst = p(view)["instances"]
                            b = np.asarray(inst.pred_boxes,
                                           np.float32).copy()
                            m = np.asarray(inst.pred_masks.masks,
                                           np.float32).copy()
                            # invert the view transform: flips first (in
                            # the rotated frame), then the rotation
                            if fh:
                                b[:, [0, 2]] = vw - b[:, [2, 0]]
                                m = m[:, :, ::-1]
                            if fv:
                                b[:, [1, 3]] = vh - b[:, [3, 1]]
                                m = m[:, ::-1, :]
                            if rk:
                                b = np.stack([w0 - b[:, 3], b[:, 0],
                                              w0 - b[:, 1], b[:, 2]],
                                             axis=1)
                                # crop grid rotates with its box:
                                # orig[r, c] = view[mw-1-c, r]
                                m = np.rot90(m, k=-1, axes=(1, 2))
                            boxes.append(np.ascontiguousarray(b))
                            scores.append(np.asarray(inst.scores,
                                                     np.float32))
                            classes.append(np.asarray(inst.pred_classes,
                                                      np.int64))
                            masks.append(np.ascontiguousarray(m))
        finally:
            for p, s in zip(predictors, saved_sizes):
                p.cfg.INPUT.MIN_SIZE_TEST = s

        n_views = (len(self.min_sizes) * len(self.flips)
                   * len(self.rots) * len(predictors))
        return merge_detections(
            np.concatenate(boxes, axis=0),
            np.concatenate(scores, axis=0),
            np.concatenate(classes, axis=0),
            np.concatenate(masks, axis=0),
            (h0, w0), nms_thresh=self.nms_thresh, max_dets=self.max_dets,
            vote_iou=self.vote_iou, n_views=n_views,
            score_mode=self.score_mode)


def merge_detections(boxes, scores, classes, masks, image_size, *,
                     nms_thresh, max_dets, vote_iou=0.0, n_views=0,
                     score_mode="max"):
    """Merge concatenated multi-view/multi-tile detections.

    Classwise greedy NMS (class-offset boxes so NMS never crosses
    classes), optional score-weighted box+mask voting over each
    survivor's cluster, optional WBF rescoring. ``masks`` are box-crop
    soft masks; boxes in original image coordinates.
    """
    h0, w0 = image_size
    offset = (classes.astype(np.float32)[:, None]
              * (max(h0, w0) + 1.0)) if classes.size else 0.0
    obias = boxes + offset
    keep = greedy_nms(obias, scores, nms_thresh)
    keep = keep[:max_dets]

    if vote_iou > 0 and keep.size:
        # voting is offset-invariant (a shared shift of src and dst
        # boxes cancels in the crop resampling), so run it on the
        # class-offset boxes and un-shift the result
        kept_boxes, kept_masks, kept_scores = vote_merge(
            obias, scores, masks, keep, vote_iou,
            n_views=n_views if score_mode == "wbf" else 0)
        kept_boxes = kept_boxes - (offset[keep]
                                   if np.ndim(offset) else offset)
        kept_classes = classes[keep]
        if score_mode == "wbf":
            order = np.argsort(-kept_scores, kind="stable")
            kept_boxes, kept_masks = kept_boxes[order], kept_masks[order]
            kept_scores, kept_classes = (kept_scores[order],
                                         kept_classes[order])
        else:
            kept_scores = scores[keep]
        inst = Instances(
            (h0, w0), pred_boxes=kept_boxes.astype(np.float32),
            scores=kept_scores, pred_classes=kept_classes,
            pred_masks=SoftMasks(kept_masks, kept_boxes, (h0, w0)))
        return {"instances": inst}

    kept_boxes = boxes[keep]
    inst = Instances(
        (h0, w0), pred_boxes=kept_boxes.astype(np.float32),
        scores=scores[keep], pred_classes=classes[keep],
        pred_masks=SoftMasks(masks[keep], kept_boxes, (h0, w0)))
    return {"instances": inst}


def _tile_origins(extent, tile, stride):
    """1-D tile origins covering [0, extent): stride-spaced, last one
    clamped so every tile fits (all tiles are exactly ``tile`` long)."""
    if extent <= tile:
        return [0]
    xs = list(range(0, extent - tile, stride)) + [extent - tile]
    # dedupe while keeping order (stride may land exactly on the end)
    out = []
    for x in xs:
        if not out or x != out[-1]:
            out.append(x)
    return out


class TiledPredictor:
    """Tiled-crop inference: predict on overlapping native-resolution
    tiles, merge in original coordinates.

    The resolution-regime lever for tiny objects (VERDICT r5 #2): the
    satellite model trains on 448-512 px crops
    (examples/powder_workflow.py --sat-native), but whole-image
    inference shows it 1536x1024 frames — a train/test field-of-view
    mismatch. Tiling restores the training distribution exactly: every
    tile is the size the model trained on, objects appear at native
    scale, and the per-shape compile cache sees ONE tile shape for any
    image size.

    Objects larger than ``overlap`` can be clipped in every tile — this
    is for tiny-object models (satellites are ~15 px; particles should
    keep whole-frame inference). Detections touching an interior tile
    edge (within ``edge_margin`` px) are dropped: the overlap guarantees
    a neighbouring tile sees them whole.
    """

    def __init__(self, cfg, tile=512, overlap=128, edge_margin=4.0,
                 nms_thresh=None, vote_iou=0.0, predictor=None,
                 tile_batch=16):
        self.predictor = predictor or DefaultPredictor(cfg)
        # self.cfg is the PREDICTOR's cfg (mutated per call to force
        # native-scale tiles); merge knobs below honor the cfg ARGUMENT,
        # like TTAPredictor
        self.cfg = self.predictor.cfg
        self.tile = int(tile)
        self.overlap = int(overlap)
        if self.overlap >= self.tile:
            raise ValueError(
                f"overlap ({self.overlap}) must be < tile ({self.tile}): "
                f"the tile stride is tile - overlap")
        self.edge_margin = float(edge_margin)
        self.nms_thresh = float(nms_thresh
                                if nms_thresh is not None
                                else cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST)
        self.max_dets = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.mask_res = 2 * int(cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION)
        self.vote_iou = float(vote_iou)
        self.tile_batch = int(tile_batch)

    def __call__(self, original_image: np.ndarray):
        h0, w0 = original_image.shape[:2]
        t = self.tile
        stride = t - self.overlap
        ys = _tile_origins(h0, t, stride)
        xs = _tile_origins(w0, t, stride)

        saved = (self.cfg.INPUT.MIN_SIZE_TEST,
                 self.cfg.INPUT.MAX_SIZE_TEST)
        th, tw = min(t, h0), min(t, w0)
        # native scale: shortest-edge target = the tile's own shortest
        # edge, max-size unconstrained -> resize is the identity
        self.cfg.INPUT.MIN_SIZE_TEST = min(th, tw)
        self.cfg.INPUT.MAX_SIZE_TEST = max(th, tw)
        origins = [(oy, ox) for oy in ys for ox in xs]
        views = [np.ascontiguousarray(original_image[oy:oy + t, ox:ox + t])
                 for oy, ox in origins]
        boxes, scores, classes, masks = [], [], [], []
        try:
            # all tiles share one shape -> batch them through the
            # predictor (one device dispatch per tile_batch instead of
            # one per tile); stub predictors without predict_batch fall
            # back to per-view calls
            batch_fn = getattr(self.predictor, "predict_batch", None)
            outs = []
            if batch_fn is not None:
                for i in range(0, len(views), self.tile_batch):
                    outs.extend(batch_fn(views[i:i + self.tile_batch]))
            else:
                outs = [self.predictor(v) for v in views]
            for (oy, ox), view, out in zip(origins, views, outs):
                inst = out["instances"]
                b = np.asarray(inst.pred_boxes, np.float32).copy()
                if not len(b):
                    continue
                vh, vw = view.shape[:2]
                m = self.edge_margin
                clipped = np.zeros(len(b), bool)
                if oy > 0:
                    clipped |= b[:, 1] < m
                if oy + vh < h0:
                    clipped |= b[:, 3] > vh - m
                if ox > 0:
                    clipped |= b[:, 0] < m
                if ox + vw < w0:
                    clipped |= b[:, 2] > vw - m
                sel = ~clipped
                if not sel.any():
                    continue
                b = b[sel]
                b[:, [0, 2]] += ox
                b[:, [1, 3]] += oy
                boxes.append(b)
                scores.append(np.asarray(inst.scores, np.float32)[sel])
                classes.append(np.asarray(inst.pred_classes,
                                          np.int64)[sel])
                masks.append(np.ascontiguousarray(np.asarray(
                    inst.pred_masks.masks, np.float32)[sel]))
        finally:
            (self.cfg.INPUT.MIN_SIZE_TEST,
             self.cfg.INPUT.MAX_SIZE_TEST) = saved

        if not boxes:
            empty = np.zeros((0, 4), np.float32)
            r = self.mask_res
            inst = Instances(
                (h0, w0), pred_boxes=empty,
                scores=np.zeros(0, np.float32),
                pred_classes=np.zeros(0, np.int64),
                pred_masks=SoftMasks(np.zeros((0, r, r), np.float32),
                                     empty, (h0, w0)))
            return {"instances": inst}
        return merge_detections(
            np.concatenate(boxes, axis=0),
            np.concatenate(scores, axis=0),
            np.concatenate(classes, axis=0),
            np.concatenate(masks, axis=0),
            (h0, w0), nms_thresh=self.nms_thresh,
            max_dets=self.max_dets, vote_iou=self.vote_iou)
