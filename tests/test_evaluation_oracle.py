"""Independent COCOeval oracle for the AP meter (VERDICT r5 item 3).

The reference defers AP to pycocotools' COCOEvaluator (reference
GETTING_STARTED.md:50-52); pycocotools is not installed here, so
``ampis_tpu.evaluation`` reimplements COCOeval semantics. This file gives
that meter an *independent* oracle: a deliberately slow, loop-by-loop
transliteration of the published COCOeval algorithm (cocoeval.py
``evaluateImg`` + ``accumulate``, single category, area range "all",
crowd-free), structured completely differently from the vectorized
production path — then asserts exact agreement on randomized inputs
(including engineered score ties, IoU ties, duplicate masks, empty
images) and on the reference's shipped prediction pickles.

A greedy-match or interpolation bug in either implementation shows up as
a mismatch here; the two would have to share the same bug to agree on
the randomized battery.
"""
import numpy as np
import pytest

from ampis_tpu import rle as RLE
from ampis_tpu.evaluation import (IOU_THRESHOLDS, RECALL_POINTS,
                                  evaluate_mask_ap)


# ---------------------------------------------------------------------------
# Oracle: faithful single-class COCOeval (pycocotools cocoeval.py semantics)
# ---------------------------------------------------------------------------

def _oracle_evaluate_img(gt_rles, dt_rles, dt_scores, iou_thrs, max_dets):
    """COCOeval.evaluateImg for one image, no crowd, area range 'all'.

    Returns (dtm (T, D) 0/1, sorted scores, n_gt)."""
    inds = np.argsort(-np.asarray(dt_scores), kind="mergesort")
    dt = [dt_rles[i] for i in inds][:max_dets]
    scores = np.asarray(dt_scores)[inds][:max_dets]
    G, D, T = len(gt_rles), len(dt), len(iou_thrs)
    dtm = np.zeros((T, D))
    if G and D:
        ious = RLE.iou(dt, gt_rles, np.zeros(G, bool))
        gtm = np.zeros((T, G))
        for tind, t in enumerate(iou_thrs):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0:
                        continue
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dtm[tind, dind] = 1
                gtm[tind, m] = dind + 1
    return dtm, scores, G


def oracle_mask_ap(gt_lists, pred_lists, iou_thrs=None, max_dets=None):
    """COCOeval.accumulate over per-image evaluateImg results."""
    if iou_thrs is None:
        iou_thrs = IOU_THRESHOLDS
    T = len(iou_thrs)
    if max_dets is None:
        max_dets = 10 ** 9
    per_img = [_oracle_evaluate_img(g, d, s, iou_thrs, max_dets)
               for g, (d, s) in zip(gt_lists, pred_lists)]
    npig = sum(G for _, _, G in per_img)
    dt_scores = np.concatenate([s for _, s, _ in per_img]) \
        if per_img else np.zeros(0)
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([m for m, _, _ in per_img], axis=1)[:, inds] \
        if per_img else np.zeros((T, 0))

    tps = dtm > 0
    fps = dtm == 0
    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
    precision = np.zeros(T)
    recall = np.zeros(T)
    for t in range(T):
        tp, fp = tp_sum[t], fp_sum[t]
        nd = len(tp)
        rc = tp / npig if npig else np.zeros(nd)
        pr = (tp / (fp + tp + np.spacing(1))).tolist()
        q = np.zeros(len(RECALL_POINTS))
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        for ri, pi in enumerate(np.searchsorted(rc, RECALL_POINTS,
                                                side="left")):
            if pi < len(pr):
                q[ri] = pr[pi]
        precision[t] = q.mean()
        recall[t] = rc[-1] if nd else 0.0
    per_iou = {round(float(x), 2): float(a)
               for x, a in zip(iou_thrs, precision)}
    return {"AP": float(precision.mean()), "per_iou": per_iou,
            "AR": float(recall.mean())}


def _assert_agree(gt_lists, pred_lists, max_dets=None):
    got = evaluate_mask_ap(gt_lists, pred_lists, max_dets=max_dets)
    want = oracle_mask_ap(gt_lists, pred_lists, max_dets=max_dets)
    assert got["AP"] == pytest.approx(want["AP"], abs=1e-9)
    assert got["AR"] == pytest.approx(want["AR"], abs=1e-9)
    for k, v in want["per_iou"].items():
        assert got["per_iou"][k] == pytest.approx(v, abs=1e-9), k


# ---------------------------------------------------------------------------
# Randomized + adversarial batteries
# ---------------------------------------------------------------------------

def _random_blobs(rng, h, w, n):
    """n random rectangle masks (random sizes/positions, overlapping)."""
    rles = []
    for _ in range(n):
        rh = int(rng.integers(2, h // 2))
        cw = int(rng.integers(2, w // 2))
        r0 = int(rng.integers(0, h - rh))
        c0 = int(rng.integers(0, w - cw))
        m = np.zeros((h, w), np.uint8)
        m[r0:r0 + rh, c0:c0 + cw] = 1
        rles.append(RLE.encode(np.asfortranarray(m)))
    return rles


def test_oracle_random_battery():
    rng = np.random.default_rng(0)
    for trial in range(8):
        n_img = int(rng.integers(1, 4))
        gt_lists, pred_lists = [], []
        for _ in range(n_img):
            gts = _random_blobs(rng, 48, 64, int(rng.integers(1, 8)))
            # predictions: jittered copies of some GTs + random FPs
            dts = []
            for g in gts:
                if rng.random() < 0.75:
                    m = RLE.decode([g])[:, :, 0]
                    shift = int(rng.integers(0, 5))
                    m = np.roll(m, shift, axis=1)
                    dts.append(RLE.encode(np.asfortranarray(m)))
            dts += _random_blobs(rng, 48, 64, int(rng.integers(0, 4)))
            scores = rng.random(len(dts))
            gt_lists.append(gts)
            pred_lists.append((dts, scores))
        _assert_agree(gt_lists, pred_lists)


def test_oracle_score_ties_and_duplicates():
    rng = np.random.default_rng(1)
    gts = _random_blobs(rng, 40, 40, 5)
    # duplicate detections of the same GT with identical scores: stable
    # (mergesort) ordering decides which one matches — both meters must
    # make the same choice
    dts = [gts[0], gts[0], gts[1], gts[2], gts[2], gts[2]]
    scores = np.asarray([0.7, 0.7, 0.7, 0.5, 0.5, 0.5])
    _assert_agree([gts], [(dts, scores)])


def test_oracle_iou_ties():
    # two identical GTs (exact IoU tie for every detection): COCOeval's
    # inner loop takes the LAST gt on ties
    m = np.zeros((32, 32), np.uint8)
    m[4:20, 4:20] = 1
    g = RLE.encode(np.asfortranarray(m))
    gts = [g, g]
    dts = [g, g, g]
    scores = np.asarray([0.9, 0.8, 0.7])
    _assert_agree([gts], [(dts, scores)])


def test_oracle_empty_images_and_no_dets():
    rng = np.random.default_rng(2)
    gt_lists = [_random_blobs(rng, 32, 32, 3),
                [],  # image with no GT: all dets are FPs
                _random_blobs(rng, 32, 32, 2)]
    pred_lists = [(gt_lists[0][:2], np.asarray([0.9, 0.8])),
                  (_random_blobs(rng, 32, 32, 2), np.asarray([0.7, 0.6])),
                  ([], np.zeros(0))]  # image with no detections
    _assert_agree(gt_lists, pred_lists)


def test_oracle_max_dets_truncation_with_ties():
    rng = np.random.default_rng(3)
    gts = _random_blobs(rng, 40, 40, 6)
    dts = gts + _random_blobs(rng, 40, 40, 4)
    scores = np.asarray([0.9, 0.9, 0.9, 0.9, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2])
    _assert_agree([gts], [(dts, scores)], max_dets=6)


# ---------------------------------------------------------------------------
# Shipped reference predictions (the number docs/parity.md headlines)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_oracle_on_shipped_powder_predictions(reference_root):
    """Re-stamp the 0.747-AP shipped-prediction oracle through the
    independent meter (same loading path as
    test_evaluation.py::test_reference_predictions_vs_via_gt)."""
    from ampis_tpu import analyze, data_utils
    from ampis_tpu.compat import load_pickle
    from ampis_tpu.evaluation import _gather_image
    from ampis_tpu.structures import InstanceSet

    dd = data_utils.get_ddicts(
        'via2', reference_root / "examples/powder/data/via_2.0.8/"
        "via_powder_particle_masks_validation.json")
    preds = load_pickle(
        reference_root /
        "examples/powder/data/sample_particle_outputs.pickle")
    pred_sets = [InstanceSet().read_from_model_out(o, inplace=False)
                 for o in preds]
    gt_sets = [InstanceSet().read_from_ddict(d, inplace=False) for d in dd]
    gt_sets, pred_sets = analyze.align_instance_sets(gt_sets, pred_sets)
    assert len(gt_sets) == 1
    gt_lists, pred_lists = [], []
    for g, p in zip(gt_sets, pred_sets):
        gt_rles, pred_rles, scores = _gather_image(g, p)
        gt_lists.append(gt_rles)
        pred_lists.append((pred_rles, scores))
    _assert_agree(gt_lists, pred_lists)
    got = evaluate_mask_ap(gt_lists, pred_lists)
    assert got["AP"] == pytest.approx(0.747, abs=0.01)
