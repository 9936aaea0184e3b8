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
    nms_thresh: merge NMS IoU; default cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST.
    """

    def __init__(self, cfg, min_sizes=None, flip=True, vflip=False,
                 nms_thresh=None, predictor=None):
        self.predictor = predictor or DefaultPredictor(cfg)
        self.cfg = self.predictor.cfg
        self.min_sizes = [int(s) for s in
                          (min_sizes or [cfg.INPUT.MIN_SIZE_TEST])]
        self.flips = [(False, False)]
        if flip:
            self.flips.append((True, False))
        if vflip:
            self.flips += [(False, True)] + ([(True, True)] if flip else [])
        self.nms_thresh = float(nms_thresh
                                if nms_thresh is not None
                                else cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST)
        self.max_dets = int(cfg.TEST.DETECTIONS_PER_IMAGE)

    def __call__(self, original_image: np.ndarray):
        h0, w0 = original_image.shape[:2]
        boxes, scores, classes, masks = [], [], [], []
        base_min_size = self.cfg.INPUT.MIN_SIZE_TEST
        try:
            for ms in self.min_sizes:
                # per-scale resize target; DefaultPredictor's per-shape
                # compile cache turns each distinct scale into one graph
                self.cfg.INPUT.MIN_SIZE_TEST = ms
                for fh, fv in self.flips:
                    view = original_image
                    if fh:
                        view = view[:, ::-1]
                    if fv:
                        view = view[::-1]
                    inst = self.predictor(
                        np.ascontiguousarray(view))["instances"]
                    b = np.asarray(inst.pred_boxes, np.float32).copy()
                    m = np.asarray(inst.pred_masks.masks,
                                   np.float32).copy()
                    if fh:  # invert the view transform
                        b[:, [0, 2]] = w0 - b[:, [2, 0]]
                        m = m[:, :, ::-1]
                    if fv:
                        b[:, [1, 3]] = h0 - b[:, [3, 1]]
                        m = m[:, ::-1, :]
                    boxes.append(b)
                    scores.append(np.asarray(inst.scores, np.float32))
                    classes.append(np.asarray(inst.pred_classes, np.int64))
                    masks.append(m)
        finally:
            self.cfg.INPUT.MIN_SIZE_TEST = base_min_size

        boxes = np.concatenate(boxes, axis=0)
        scores = np.concatenate(scores, axis=0)
        classes = np.concatenate(classes, axis=0)
        masks = np.concatenate(masks, axis=0)

        # classwise merge: offset boxes per class so NMS never crosses
        # classes (single-class datasets pass through unchanged)
        offset = (classes.astype(np.float32)[:, None]
                  * (max(h0, w0) + 1.0)) if classes.size else 0.0
        keep = greedy_nms(boxes + offset, scores, self.nms_thresh)
        keep = keep[:self.max_dets]

        kept_boxes = boxes[keep]
        inst = Instances(
            (h0, w0), pred_boxes=kept_boxes.astype(np.float32),
            scores=scores[keep], pred_classes=classes[keep],
            pred_masks=SoftMasks(masks[keep], kept_boxes, (h0, w0)))
        return {"instances": inst}
