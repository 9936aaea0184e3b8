"""Analysis and evaluation of instance predictions.

Re-implementation of the reference's ampis/analyze.py (728 LoC): ground
truth <-> prediction matching on mask IoU, detection/segmentation
precision-recall, boundary-error distances, and performance-visualization
instance sets.

Differences from the reference, by design:

* pairwise IoU uses the batched C++ codec (ampis_tpu.rle.iou) with no 80x80
  tiling limit; the tiled helpers (`_piecewise_iou`, `_piecewise_rle_match`,
  reference analyze.py:54-181) are kept with identical outputs for API
  compatibility, but both paths produce the same numbers;
* `mask_edge_distance` (reference analyze.py:416-499) computes min-distance
  with a float64 host-numpy broadcast instead of torch (float64 because the
  reference's torch path accumulates in double; see `_min_euclid`).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from . import rle
from .structures import (InstanceSet, Instances, RLEMasks, masks_to_rle,
                         masks_to_bitmask_array)


def align_instance_sets(a, b):
    """Reorder list *b* to match list *a* by image filename.

    Reference: analyze.py:19-51. Only pairs present in both lists are kept.
    """
    by_name = {Path(item.filepath).name: item for item in b}
    pairs = [(item, by_name[Path(item.filepath).name]) for item in a
             if Path(item.filepath).name in by_name]
    if not pairs:
        return [], []
    a_ordered, b_ordered = (list(col) for col in zip(*pairs))
    return a_ordered, b_ordered


def _piecewise_iou(a, b, interval=80):
    """len(a) x len(b) pairwise IoU, computed in interval-sized tiles.

    Reference: analyze.py:54-112 (tiling worked around a pycocotools batch
    limit). The C++ codec has no such limit, but the tiled signature is
    preserved so callers of the reference API keep bit-identical outputs;
    each tile is one batched-kernel call.
    """
    out = np.zeros((len(a), len(b)))
    no_crowd = np.zeros(interval, bool)
    for r0 in range(0, len(a), interval):
        rows = a[r0:r0 + interval]
        for c0 in range(0, len(b), interval):
            cols = b[c0:c0 + interval]
            # codec convention: iou(dt, gt, iscrowd) -> (n_dt, n_gt)
            out[r0:r0 + len(rows), c0:c0 + len(cols)] = rle.iou(
                cols, rows, no_crowd[:len(rows)]).T
    return out


def _piecewise_rle_match(gt, pred, iou_thresh=0.5, interval=80):
    """Greedy per-GT argmax matching of RLE masks by IoU.

    Reference: analyze.py:115-181. Each ground-truth mask matches the
    prediction with the highest IoU if that IoU exceeds ``iou_thresh``;
    unmatched GT are false negatives, unmatched predictions false positives.
    The batched IoU matrix is computed in one C++ call; the greedy argmax
    sweep over GT rows reproduces the reference's matching order exactly
    (including its behavior when one prediction is the argmax of several GT
    masks: each such GT records a match to the same prediction).
    """
    iou_matrix = rle.iou(pred, gt, np.zeros(len(gt), bool))  # (n_pred, n_gt)

    tp = []
    fn = []
    iou_scores = []
    pred_matched = np.zeros(len(pred), bool)

    for gt_idx in range(len(gt)):
        col = iou_matrix[:, gt_idx] if len(pred) else np.zeros(0)
        if col.size:
            iou_argmax = int(np.argmax(col))
            iou_max = col[iou_argmax]
        else:
            iou_argmax, iou_max = -1, 0.0
        if iou_max > iou_thresh:
            tp.append([gt_idx, iou_argmax])
            iou_scores.append(iou_max)
            pred_matched[iou_argmax] = True
        else:
            fn.append(gt_idx)

    fp = np.asarray(
        [x for x, matched in enumerate(pred_matched) if not matched], int)

    return {'tp': np.asarray(tp, int),
            'fn': np.asarray(fn, int),
            'fp': np.asarray(fp, int),
            'iou': np.asarray(iou_scores)}


def rle_instance_matcher(gt, pred, iou_thresh=0.5, size=None):
    """Match GT and predicted instances by mask IoU (single class).

    Reference: analyze.py:184-223. Returns {'tp': (n_match, 2) [gt_idx,
    pred_idx], 'fn', 'fp', 'iou'}.
    """
    gt = masks_to_rle(gt, size)
    pred = masks_to_rle(pred, size)
    return _piecewise_rle_match(gt, pred, iou_thresh)


def det_seg_scores(gt, pred, iou_thresh=0.5, size=None):
    """Detection and segmentation precision/recall for a pair of mask sets.

    Reference: analyze.py:226-339. Detection P/R count matched instances;
    segmentation P/R count pixels within each matched pair (computed from
    RLE intersection areas, no decode).
    """
    gtmasks = masks_to_rle(gt, size)
    predmasks = masks_to_rle(pred, size)

    detection_results = rle_instance_matcher(
        gtmasks, predmasks, iou_thresh=iou_thresh, size=size)
    matches = np.asarray(detection_results['tp'])

    tp_det = len(matches)
    fn_det = len(detection_results['fn'])
    fp_det = len(detection_results['fp'])

    det_precision = tp_det / (tp_det + fp_det) if tp_det + fp_det else 0.0
    det_recall = tp_det / (tp_det + fn_det) if tp_det + fn_det else 0.0

    gtmasks_tp = [gtmasks[i[0]] for i in matches]
    predmasks_tp = [predmasks[i[1]] for i in matches]
    seg_tp = np.array(
        [int(rle.area(rle.merge([m1, m2], intersect=True)))
         for m1, m2 in zip(gtmasks_tp, predmasks_tp)], np.int64)

    tp_gt_area = np.array([int(rle.area(m)) for m in gtmasks_tp], np.int64)
    tp_pred_area = np.array([int(rle.area(m)) for m in predmasks_tp],
                            np.int64)

    seg_fp = tp_pred_area - seg_tp
    seg_fn = tp_gt_area - seg_tp

    with np.errstate(divide='ignore', invalid='ignore'):
        seg_precision = seg_tp / (seg_tp + seg_fp)
        seg_recall = seg_tp / (seg_tp + seg_fn)

    return {'det_precision': det_precision,
            'det_recall': det_recall,
            'seg_precision': seg_precision,
            'seg_recall': seg_recall,
            'det_tp': matches,
            'det_fn': detection_results['fn'],
            'det_fp': detection_results['fp'],
            'seg_tp': seg_tp,
            'seg_fn': seg_fn,
            'seg_fp': seg_fp,
            'det_tp_iou': detection_results['iou']}


def merge_boxes(box1, box2):
    """Smallest [r1, r2, c1, c2] box enclosing both input boxes.

    Reference: analyze.py:342-376.
    """
    r11, r12, c11, c12 = box1
    r21, r22, c21, c22 = box2
    return np.array([min(r11, r21), max(r12, r22),
                     min(c11, c21), max(c12, c22)])


def _min_euclid(a, b, chunk=1 << 22):
    """Min euclidean distance from each row of *a* to rows of *b*.

    Reference: analyze.py:379-413 (torch, float64-capable). Computed in
    numpy float64 on the host — full reference precision. (A jitted JAX
    version would silently truncate to float32 because x64 stays
    globally disabled for the TPU compute path, and TPUs have no fast
    f64 anyway; these point sets are tiny boundary neighborhoods, far
    below accelerator-worthy sizes.) Chunked over rows of *a* so the
    (n, m) distance matrix stays under ~``chunk`` elements.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if len(a) == 0:
        return np.zeros(0)
    if len(b) == 0:
        return np.full(len(a), np.inf)
    rows = max(chunk // len(b), 1)
    out = np.empty(len(a))
    for lo in range(0, len(a), rows):
        diff = a[lo:lo + rows, None, :] - b[None, :, :]
        out[lo:lo + rows] = np.sqrt((diff * diff).sum(axis=2).min(axis=1))
    return out


def mask_edge_distance(gt_mask, pred_mask, gt_box, pred_box, matches,
                       device='auto'):
    """Boundary disagreement between matched mask pairs.

    Reference: analyze.py:416-499. For each matched pair: distance from
    every false-positive pixel to the nearest GT pixel and from every
    false-negative pixel to the nearest predicted pixel. ``device`` is
    accepted for API compatibility; computation happens wherever JAX runs.
    """
    if isinstance(gt_mask, RLEMasks):
        gt_mask = gt_mask.rle
    if isinstance(pred_mask, RLEMasks):
        pred_mask = pred_mask.rle

    gt_masks = [gt_mask[i] for i in matches[:, 0]]
    gt_boxes = [gt_box[i] for i in matches[:, 0]]
    pred_masks = [pred_mask[i] for i in matches[:, 1]]
    pred_boxes = [pred_box[i] for i in matches[:, 1]]

    FP_distances = []
    FN_distances = []
    for gm, pm, gb, pb in zip(gt_masks, pred_masks, gt_boxes, pred_boxes):
        r1, r2, c1, c2 = merge_boxes(gb, pb)
        gm_arr = rle.decode(gm)[r1:r2, c1:c2].astype(bool)
        pm_arr = rle.decode(pm)[r1:r2, c1:c2].astype(bool)

        gt_where = np.stack(np.where(gm_arr), axis=1)
        pred_where = np.stack(np.where(pm_arr), axis=1)
        FP_where = np.stack(np.where(pm_arr & ~gm_arr), axis=1)
        FN_where = np.stack(np.where(gm_arr & ~pm_arr), axis=1)

        FP_dist = (_min_euclid(FP_where, gt_where) if FP_where.size
                   else np.zeros(0))
        FN_dist = (_min_euclid(FN_where, pred_where) if FN_where.size
                   else np.zeros(0))
        FP_distances.append(FP_dist)
        FN_distances.append(FN_dist)

    return FP_distances, FN_distances


# default TP/FP/FN overlay colors — behavior pin from reference
# analyze.py:551-554 (TP purple, FP cyan, FN red)
_DET_PERF_COLORMAP = {'TP': (0.5, 0., 1.),
                      'FP': (0., 1., 1.),
                      'FN': (1., 0., 0.)}


def det_perf_iset(gt, pred, match_results=None, colormap=None, tp_gt=False):
    """InstanceSet coloring detection TP/FP/FN for visualization.

    Reference: analyze.py:502-586. One instance per TP (from pred, or gt
    when ``tp_gt``), FP (unmatched pred), FN (unmatched gt), colored by
    group and stacked in TP/FP/FN order.
    """
    if match_results is None:
        match_results = rle_instance_matcher(gt, pred)
    return_colormap = colormap is None
    if colormap is None:
        colormap = {k: np.asarray(v) for k, v in _DET_PERF_COLORMAP.items()}

    def side(iset):  # (RLE masks, bbox array) of one InstanceSet
        boxes = iset.instances.boxes
        return (masks_to_rle(iset.instances.masks, gt.instances.image_size),
                boxes if isinstance(boxes, np.ndarray)
                else np.asarray(boxes.tensor))

    gt_side, pred_side = side(gt), side(pred)
    matched = match_results['tp']
    # each group: (color key, (masks, boxes) source, indices into it)
    groups = (('TP', gt_side if tp_gt else pred_side,
               matched[:, 0] if tp_gt else matched[:, 1]),
              ('FP', pred_side, match_results['fp']),
              ('FN', gt_side, match_results['fn']))

    masks, boxes, colors = [], [], []
    for key, (side_masks, side_boxes), idx in groups:
        masks.extend(side_masks[i] for i in idx)
        boxes.append(side_boxes[np.asarray(idx, dtype=int)])
        colors.append(np.tile(colormap[key], (len(idx), 1)))

    masks = RLEMasks(masks)
    iset = InstanceSet()
    iset.instances = Instances(image_size=tuple(masks.rle[0]['size']),
                               masks=masks,
                               boxes=np.concatenate(boxes, axis=0),
                               colors=np.concatenate(colors, axis=0))
    return (iset, colormap) if return_colormap else iset


# seg_perf_iset output pins (reference analyze.py:658-689): per-pixel
# 3-bit code tp|fn<<1|fp<<2, its channel layouts, and the two palettes.
# 'all' keeps the 7 non-background codes as channels 0-6; 'reduced'
# routes codes through a lookup: tp->0, fn->1, fp->2, any overlap->3.
_SEG_PERF_MODES = {
    'all': (np.arange(1, 8),  # code -> channel: identity minus background
            np.array([[0.153, 0.153, 0.000], [0.286, 1., 0.],
                      [1., 0.857, 0.], [1., 0., 0.], [0., 0.571, 1.],
                      [0., 1., 0.571], [0.285, 0., 1.]]),
            ['Other', 'TP', 'FN', 'TP+FN', 'FP', 'TP+FP', 'FN+FP',
             'TP+FN+FP']),
    'reduced': (np.array([-1, 0, 1, 3, 2, 3, 3, 3]),  # code -> channel
                np.array([[0.5, 0., 1.], [1., 0., 0.],
                          [0., 1., 1.], [1., 1., 0.]]),
                ['TP', 'FN', 'FP', 'other']),
}


def seg_perf_iset(gt_masks, pred_masks, match_results=None, mode='reduced'):
    """InstanceSet of pixelwise TP/FN/FP/overlap maps for visualization.

    Reference: analyze.py:589-699. Pixels are classified via the 3-bit
    code tp + 2*fn + 4*fp; 'all' mode keeps the 7 non-background
    combinations, 'reduced' collapses to TP / FN / FP / other.
    """
    if match_results is None:
        match_results = rle_instance_matcher(gt_masks, pred_masks)
    gt_arr = masks_to_bitmask_array(gt_masks)
    pred_arr = masks_to_bitmask_array(pred_masks)
    pairs_gt = gt_arr[match_results['tp'][:, 0]]
    pairs_pred = pred_arr[match_results['tp'][:, 1]]

    # 3-bit per-pixel code over the union of matched pairs
    code = ((pairs_gt & pairs_pred).any(axis=0).astype(np.uint8)
            | (pairs_gt & ~pairs_pred).any(axis=0) << np.uint8(1)
            | (~pairs_gt & pairs_pred).any(axis=0) << np.uint8(2))

    if mode == 'all':
        code_to_channel, palette, labels = _SEG_PERF_MODES['all']
        channels = code[:, :, None] == code_to_channel  # (h, w, 7)
    else:
        code_to_channel, palette, labels = _SEG_PERF_MODES['reduced']
        channels = (code_to_channel[code][:, :, None]
                    == np.arange(len(palette)))  # (h, w, 4)

    masks = RLEMasks(rle.encode(
        np.asfortranarray(channels.astype(np.uint8))))
    iset = InstanceSet()
    iset.instances = Instances(image_size=tuple(masks.rle[0]['size']),
                               masks=masks, colors=palette,
                               boxes=np.zeros((len(masks), 4)))
    return iset, [palette, labels]
