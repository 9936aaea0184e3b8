import numpy as np
import pytest

from ampis_tpu import rle as RLE
from ampis_tpu.evaluation import evaluate_mask_ap


def _mask(h, w, r0, c0, rh, cw):
    m = np.zeros((h, w), np.uint8, order="F")
    m[r0:r0 + rh, c0:c0 + cw] = 1
    return RLE.encode(np.asfortranarray(m))


def test_perfect_predictions_ap1():
    gt = [_mask(32, 32, 2, 2, 10, 10), _mask(32, 32, 18, 18, 8, 8)]
    preds = (gt, np.asarray([0.9, 0.8]))
    out = evaluate_mask_ap([gt], [preds])
    assert out["AP"] == pytest.approx(1.0, abs=1e-6)
    assert out["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert out["AR"] == pytest.approx(1.0, abs=1e-6)


def test_missed_instance_halves_recall():
    gt = [_mask(32, 32, 2, 2, 10, 10), _mask(32, 32, 18, 18, 8, 8)]
    preds = ([gt[0]], np.asarray([0.9]))
    out = evaluate_mask_ap([gt], [preds])
    # one of two found perfectly: precision 1 up to recall 0.5
    assert out["AP50"] == pytest.approx(51 / 101, abs=1e-6)
    assert out["AR"] == pytest.approx(0.5, abs=1e-6)


def test_false_positive_lowers_ap():
    gt = [_mask(32, 32, 2, 2, 10, 10)]
    # high-scoring FP ranked above the TP
    preds = ([_mask(32, 32, 20, 20, 5, 5), gt[0]], np.asarray([0.95, 0.9]))
    out = evaluate_mask_ap([gt], [preds])
    # precision at full recall is 0.5, first point (recall 0) interpolates
    assert 0.4 < out["AP50"] <= 0.51


def test_localization_quality_spreads_over_thresholds():
    gt = [_mask(64, 64, 10, 10, 20, 20)]
    # shifted prediction: IoU ~ (20-4)/(2*20*20/... compute: overlap 16x20
    shifted = _mask(64, 64, 10, 14, 20, 20)
    iou = RLE.iou([shifted], gt, np.zeros(1, bool))[0, 0]
    preds = ([shifted], np.asarray([0.9]))
    out = evaluate_mask_ap([gt], [preds])
    for thr, ap in out["per_iou"].items():
        if thr <= iou:
            assert ap == pytest.approx(1.0, abs=1e-6)
        else:
            assert ap == 0.0


def test_multi_image_aggregation():
    gt1 = [_mask(32, 32, 2, 2, 10, 10)]
    gt2 = [_mask(32, 32, 4, 4, 12, 12)]
    out = evaluate_mask_ap(
        [gt1, gt2],
        [(gt1, np.asarray([0.9])), (gt2, np.asarray([0.8]))])
    assert out["AP"] == pytest.approx(1.0, abs=1e-6)


def test_score_ties_keep_input_order():
    """Stable sort: among equal scores the earlier detection ranks first,
    which changes AP when one is a TP and the other an FP."""
    gt = [_mask(32, 32, 2, 2, 10, 10)]
    fp = _mask(32, 32, 20, 20, 5, 5)
    # TP listed first: precision 1.0 at recall 1 -> AP 1.0
    out = evaluate_mask_ap([gt], [([gt[0], fp], np.asarray([0.9, 0.9]))])
    assert out["AP50"] == pytest.approx(1.0, abs=1e-6)
    # FP listed first: precision 0.5 everywhere -> AP 0.5
    out = evaluate_mask_ap([gt], [([fp, gt[0]], np.asarray([0.9, 0.9]))])
    assert out["AP50"] == pytest.approx(0.5, abs=1e-6)


def test_duplicate_detections_count_once():
    """A second detection of an already-taken GT is an FP (hand-computed)."""
    gt = [_mask(32, 32, 2, 2, 10, 10), _mask(32, 32, 18, 18, 8, 8)]
    dets = [gt[0], gt[0], gt[1]]
    out = evaluate_mask_ap([gt], [(dets, np.asarray([0.9, 0.8, 0.7]))])
    # PR points: (r=.5, p=1), (r=.5, p=.5), (r=1, p=2/3); envelope
    # gives p=1 for r<=0.5 (51 pts) and 2/3 above (50 pts)
    assert out["AP50"] == pytest.approx((51 + 50 * 2 / 3) / 101, abs=1e-6)


def test_empty_images_enter_totals():
    """GT-only and det-only images adjust recall/precision (hand-computed)."""
    g1 = [_mask(32, 32, 2, 2, 10, 10)]   # missed entirely
    g3 = [_mask(32, 32, 4, 4, 12, 12)]   # found perfectly
    fp = _mask(32, 32, 20, 20, 6, 6)     # on an image with no GT
    out = evaluate_mask_ap(
        [g1, [], g3],
        [([], np.zeros(0)), ([fp], np.asarray([0.95])),
         (g3, np.asarray([0.9]))])
    # global ranking: FP(0.95), TP(0.9); n_gt=2 -> precision 0.5 capped
    # at recall 0.5: 51 of 101 points see precision 0.5
    assert out["AP50"] == pytest.approx(51 * 0.5 / 101, abs=1e-6)
    assert out["AR"] == pytest.approx(0.5, abs=1e-6)


def test_no_gt_no_dets_zero():
    out = evaluate_mask_ap([[]], [([], np.zeros(0))])
    assert out["AP"] == 0.0 and out["AR"] == 0.0


def _greedy_match_loops(iou, thresholds):
    """Straightforward per-threshold greedy loop (the pre-vectorization
    implementation, kept as the differential oracle)."""
    n_det, n_gt = iou.shape
    matched = np.zeros((n_det, len(thresholds)), bool)
    for ti, thr in enumerate(thresholds):
        taken = np.zeros(n_gt, bool)
        for d in range(n_det):
            best, best_iou = -1, thr
            for g in range(n_gt):
                if taken[g]:
                    continue
                if iou[d, g] >= best_iou:
                    best_iou = iou[d, g]
                    best = g
            if best >= 0:
                taken[best] = True
                matched[d, ti] = True
    return matched


def test_greedy_match_vectorized_equals_loops():
    from ampis_tpu.evaluation import IOU_THRESHOLDS, _greedy_match
    rng = np.random.RandomState(7)
    for trial in range(20):
        n_det = rng.randint(1, 30)
        n_gt = rng.randint(1, 20)
        # quantized IoUs force exact ties, exercising last-gt-wins
        iou = rng.randint(0, 11, (n_det, n_gt)) / 10.0
        got = _greedy_match(iou, IOU_THRESHOLDS)
        want = _greedy_match_loops(iou, IOU_THRESHOLDS)
        np.testing.assert_array_equal(got, want)


def test_evaluate_dataset_runs_predictor_over_catalog(tmp_path):
    """evaluate_dataset: registered dataset -> predictor -> mask AP. A stub
    predictor that returns each image's own GT must score AP == 1."""
    from ampis_tpu import rle as RLE
    from ampis_tpu.engine.catalog import DatasetCatalog
    from ampis_tpu.evaluation import evaluate_dataset
    from PIL import Image

    rng = np.random.RandomState(3)
    ddicts = []
    for i in range(2):
        img_path = tmp_path / f"im{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (32, 32), np.uint8)).save(img_path)
        masks = np.zeros((32, 32, 3), np.uint8, order="F")
        for j in range(3):
            y, x = 4 + 9 * j, 3 + 8 * i
            masks[y:y + 6, x:x + 7, j] = 1
        ddicts.append({
            "file_name": str(img_path), "height": 32, "width": 32,
            "image_id": i, "annotations": [
                {"bbox": np.array([0, 0, 31, 31]), "bbox_mode": 0,
                 "segmentation": r, "category_id": 0}
                for r in RLE.encode(masks)]})
    name = "eval_dataset_stub"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: ddicts)

    calls = []

    def predictor(img):
        d = ddicts[len(calls)]
        calls.append(img.shape)
        rles = [a["segmentation"] for a in d["annotations"]]
        return (rles, np.linspace(0.9, 0.7, len(rles)))

    out = evaluate_dataset(name, predictor)
    assert len(calls) == 2 and all(s == (32, 32, 3) for s in calls)
    assert out["AP"] == 1.0 and out["AP50"] == 1.0
    DatasetCatalog.remove(name)


def test_shipped_predictions_against_gt(reference_root):
    """Mask AP of the reference model's own shipped predictions vs the VIA
    ground truth (powder validation image) — pins the whole pipeline:
    polygon rasterization, RLE IoU, matching, AP math."""
    from ampis_tpu import data_utils
    from ampis_tpu.compat import load_pickle
    from ampis_tpu.structures import InstanceSet
    from ampis_tpu import analyze

    dd = data_utils.get_ddicts(
        'via2', reference_root / "examples/powder/data/via_2.0.8/"
        "via_powder_particle_masks_validation.json")
    preds = load_pickle(
        reference_root / "examples/powder/data/sample_particle_outputs.pickle")
    pred_sets = [InstanceSet().read_from_model_out(o, inplace=False)
                 for o in preds]
    gt_sets = [InstanceSet().read_from_ddict(d, inplace=False) for d in dd]
    gt_sets, pred_sets = analyze.align_instance_sets(gt_sets, pred_sets)
    assert len(gt_sets) == 1
    out = evaluate_mask_ap(gt_sets, pred_sets)
    # detectron2-quality predictions on their own training distribution
    assert out["AP50"] > 0.7
    assert out["AP"] > 0.4
    assert out["AP"] <= out["AP50"]
