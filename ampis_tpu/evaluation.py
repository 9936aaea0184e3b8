"""COCO-style average precision evaluation on RLE masks.

The reference defers AP to pycocotools' COCOEvaluator (mentioned optional,
GETTING_STARTED.md:50-52) and mostly uses its own det/seg P-R scores
(ampis_tpu.analyze). The BASELINE north star, however, is "mask AP within
0.5 of Detectron2", so the framework ships its own evaluator: standard COCO
AP (101-point interpolated precision, IoU thresholds 0.5:0.05:0.95,
score-ranked greedy matching) over this package's C++ RLE IoU kernel —
single-class, no pycocotools.
"""
from __future__ import annotations

import numpy as np

from . import rle as RLE
from .structures import InstanceSet, masks_to_rle

IOU_THRESHOLDS = np.arange(0.5, 0.96, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _gather_image(gt, pred):
    """Extract (gt_rles, pred_rles, scores) for one image pair."""
    if isinstance(gt, dict) and "annotations" in gt:  # ddict
        size = (gt["height"], gt["width"])
        segs = [a["segmentation"] for a in gt["annotations"]]
        if segs and not isinstance(segs[0], dict):
            gt_rles = [RLE.frPyObjects(s, *size)[0] for s in segs]
        else:
            gt_rles = segs
    elif isinstance(gt, InstanceSet):
        gt_rles = masks_to_rle(gt.instances.masks, gt.instances.image_size)
    else:
        gt_rles = list(gt)

    if isinstance(pred, InstanceSet):
        pred_rles = masks_to_rle(pred.instances.masks,
                                 pred.instances.image_size)
        scores = (np.asarray(pred.instances.scores)
                  if pred.instances.has("scores")
                  else np.ones(len(pred_rles)))
    elif isinstance(pred, dict) and ("pred" in pred or "instances" in pred):
        # format_outputs schema or raw predictor output
        inst = pred["pred"]["instances"] if "pred" in pred \
            else pred["instances"]
        masks = inst.pred_masks
        pred_rles = masks.to_rle() if hasattr(masks, "to_rle") else masks
        scores = np.asarray(inst.scores)
    else:
        pred_rles, scores = pred
        scores = np.asarray(scores)
    return gt_rles, pred_rles, scores


def _greedy_match(iou, thresholds):
    """COCO greedy matching, vectorized over GTs and IoU thresholds.

    iou: (n_det, n_gt) with detections already in descending score order.
    Returns (n_det, T) bool. Semantics match pycocotools COCOeval: each
    detection takes the not-yet-taken GT with the highest IoU >= threshold;
    on exact IoU ties the later GT index wins (COCOeval's loop updates on
    non-strict comparison).
    """
    n_det, n_gt = iou.shape
    thresholds = np.asarray(thresholds, np.float64)
    t = len(thresholds)
    taken = np.zeros((t, n_gt), bool)
    matched = np.zeros((n_det, t), bool)
    rev = slice(None, None, -1)
    for d in range(n_det):
        # (T, n_gt) candidates for this detection at every threshold
        avail = (~taken) & (iou[d] >= thresholds[:, None])
        cand = np.where(avail, iou[d], -1.0)
        best = n_gt - 1 - np.argmax(cand[:, rev], axis=1)  # last tie wins
        ok = cand[np.arange(t), best] >= 0
        matched[d] = ok
        taken[np.flatnonzero(ok), best[ok]] = True
    return matched


def evaluate_mask_ap(gt_list, pred_list, iou_thresholds=None,
                     max_dets=None):
    """Single-class COCO mask AP over paired per-image GT and predictions.

    gt_list: list of ddicts / InstanceSets / RLE lists.
    pred_list: matching list of InstanceSets / format_outputs dicts /
      (rles, scores) tuples.
    Returns dict: AP (mean over IoU 0.5:0.95), AP50, AP75, per_iou, AR.
    """
    if iou_thresholds is None:
        iou_thresholds = IOU_THRESHOLDS
    iou_thresholds = np.asarray(iou_thresholds)
    t = len(iou_thresholds)

    all_scores = []
    all_matched = []   # (n_det, T) bool: matched at threshold
    n_gt_total = 0

    for gt, pred in zip(gt_list, pred_list):
        gt_rles, pred_rles, scores = _gather_image(gt, pred)
        if max_dets is not None and len(pred_rles) > max_dets:
            # stable sort: on tied scores COCOeval keeps the earlier
            # detection (mergesort), so truncation must too
            order = np.argsort(-scores, kind="mergesort")[:max_dets]
            pred_rles = [pred_rles[i] for i in order]
            scores = scores[order]
        n_gt = len(gt_rles)
        n_gt_total += n_gt
        n_det = len(pred_rles)
        if n_det == 0:
            continue
        order = np.argsort(-scores, kind="mergesort")
        pred_sorted = [pred_rles[i] for i in order]
        scores_sorted = scores[order]

        matched = np.zeros((n_det, t), bool)
        if n_gt:
            iou = RLE.iou(pred_sorted, gt_rles, np.zeros(n_gt, bool))
            matched = _greedy_match(iou, iou_thresholds)
        all_scores.append(scores_sorted)
        all_matched.append(matched)

    if n_gt_total == 0 or not all_scores:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0,
                "per_iou": {float(x): 0.0 for x in iou_thresholds},
                "AR": 0.0}

    scores = np.concatenate(all_scores)
    matched = np.concatenate(all_matched, axis=0)
    order = np.argsort(-scores, kind="mergesort")
    matched = matched[order]

    aps = np.zeros(t)
    recalls = np.zeros(t)
    for ti in range(t):
        tp = np.cumsum(matched[:, ti])
        fp = np.cumsum(~matched[:, ti])
        recall = tp / n_gt_total
        precision = tp / np.maximum(tp + fp, 1)
        # monotone non-increasing precision envelope
        precision = np.maximum.accumulate(precision[::-1])[::-1]
        # 101-point interpolation
        idx = np.searchsorted(recall, RECALL_POINTS, side="left")
        prec_at = np.where(idx < len(precision), precision[np.minimum(
            idx, len(precision) - 1)], 0.0)
        aps[ti] = prec_at.mean()
        recalls[ti] = recall[-1] if len(recall) else 0.0

    per_iou = {round(float(x), 2): float(a)
               for x, a in zip(iou_thresholds, aps)}
    out = {"AP": float(aps.mean()),
           "AP50": per_iou.get(0.5, float(aps[0])),
           "AP75": per_iou.get(0.75, 0.0),
           "per_iou": per_iou,
           "AR": float(recalls.mean())}
    return out


def evaluate_dataset(dataset_name, predictor, iou_thresholds=None,
                     max_dets=None):
    """Run the predictor over a registered dataset and compute mask AP."""
    from .engine.catalog import DatasetCatalog
    from .utils.io import imread_bgr

    ddicts = DatasetCatalog.get(dataset_name)
    preds = []
    for d in ddicts:
        img = imread_bgr(d["file_name"])
        preds.append(predictor(img))
    return evaluate_mask_ap(ddicts, preds, iou_thresholds=iou_thresholds,
                            max_dets=max_dets)
