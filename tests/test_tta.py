"""TTAPredictor (engine.tta): view inversion + NMS merging, no model."""
import numpy as np
import pytest

from ampis_tpu.engine.config import get_cfg
from ampis_tpu.engine.tta import TTAPredictor, greedy_nms
from ampis_tpu.structures import Instances, SoftMasks

# compile-heavy layer: full model programs compile for minutes on
# the CPU mesh; run via the full suite, not `pytest -m 'not slow'`
pytestmark = pytest.mark.slow


def test_greedy_nms_basic():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = greedy_nms(boxes, scores, 0.5)
    assert keep.tolist() == [0, 2]
    # below-threshold overlap survives
    keep = greedy_nms(boxes, scores, 0.95)
    assert keep.tolist() == [0, 1, 2]


class _StubPredictor:
    """Detects the single bright rectangle in the view it is given, in
    VIEW coordinates — so TTA must invert flips to make views agree."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.calls = 0

    def __call__(self, image):
        self.calls += 1
        bright = image[:, :, 0] > 100
        ys, xs = np.nonzero(bright)
        box = np.array([[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]],
                       np.float32)
        mask = np.zeros((1, 28, 28), np.float32)
        mask[0, :, :14] = 1.0  # left half in view coords
        inst = Instances(image.shape[:2], pred_boxes=box,
                         scores=np.array([0.5 + 0.01 * self.calls],
                                         np.float32),
                         pred_classes=np.zeros(1, np.int64),
                         pred_masks=SoftMasks(mask, box, image.shape[:2]))
        return {"instances": inst}


def _make_tta(**kw):
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    stub = _StubPredictor(cfg)
    return TTAPredictor(cfg, predictor=stub, **kw), stub


def test_views_invert_and_merge_to_one():
    tta, stub = _make_tta(flip=True, vflip=True)
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 200  # one bright rectangle
    out = tta(img)["instances"]
    assert stub.calls == 4  # identity, h, v, hv
    # all four views' detections invert to the same box -> one survivor
    assert len(out.scores) == 1
    np.testing.assert_allclose(out.pred_boxes[0], [12, 10, 30, 20])
    # the survivor is the highest-score view
    assert out.scores[0] == max(0.5 + 0.01 * c for c in (1, 2, 3, 4))


def test_mask_crops_inverted_with_view():
    """An h-flipped view's mask crop flips back: the stub marks the view's
    left half, which is the ORIGINAL's right half under h-flip."""
    tta, stub = _make_tta(flip=True, vflip=False)
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 200
    out = tta(img)["instances"]
    assert stub.calls == 2
    m = np.asarray(out.pred_masks.masks)
    # survivor is the flipped view (higher score) -> right half marked
    assert m[0, :, 14:].all() and not m[0, :, :14].any()


def test_rot90_views_invert_and_merge_to_one():
    """rot90=True with both flips = all 8 D4 symmetries; every view's
    detection must invert to the identical original-frame box."""
    tta, stub = _make_tta(flip=True, vflip=True, rot90=True)
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 200
    out = tta(img)["instances"]
    assert stub.calls == 8
    assert len(out.scores) == 1
    np.testing.assert_allclose(out.pred_boxes[0], [12, 10, 30, 20])


def test_rot90_mask_crop_rotates_back():
    """The rotated view's mask crop marks the view's left half (low u =
    low original y), which is the ORIGINAL's top half after inversion."""
    tta, stub = _make_tta(flip=False, vflip=False, rot90=True)
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 200
    out = tta(img)["instances"]
    assert stub.calls == 2
    # survivor is the rotated view (second call -> higher stub score)
    m = np.asarray(out.pred_masks.masks)
    assert m[0, :14, :].all() and not m[0, 14:, :].any()
    np.testing.assert_allclose(out.pred_boxes[0], [12, 10, 30, 20])


def test_disjoint_views_accumulate():
    """Detections that do NOT coincide across views all survive NMS."""
    cfg = get_cfg()
    cfg.TEST.DETECTIONS_PER_IMAGE = 10

    class TwoBox:
        def __init__(self):
            self.cfg = cfg
            self.n = 0

        def __call__(self, image):
            self.n += 1
            box = np.array([[5.0 * self.n, 0, 5.0 * self.n + 3, 3]],
                           np.float32)
            inst = Instances(image.shape[:2], pred_boxes=box,
                             scores=np.array([0.9], np.float32),
                             pred_classes=np.zeros(1, np.int64),
                             pred_masks=SoftMasks(
                                 np.ones((1, 28, 28), np.float32), box,
                                 image.shape[:2]))
            return {"instances": inst}

    tta = TTAPredictor(cfg, predictor=TwoBox(), flip=False, vflip=False,
                       min_sizes=(64, 96))
    out = tta(np.zeros((40, 60, 3), np.uint8))["instances"]
    assert len(out.scores) == 2  # one per scale, no merging


def test_max_detections_cap():
    cfg = get_cfg()
    cfg.TEST.DETECTIONS_PER_IMAGE = 1

    class ManyBox:
        def __init__(self):
            self.cfg = cfg

        def __call__(self, image):
            boxes = np.array([[0, 0, 3, 3], [10, 10, 13, 13]], np.float32)
            inst = Instances(
                image.shape[:2], pred_boxes=boxes,
                scores=np.array([0.9, 0.8], np.float32),
                pred_classes=np.zeros(2, np.int64),
                pred_masks=SoftMasks(np.ones((2, 28, 28), np.float32),
                                     boxes, image.shape[:2]))
            return {"instances": inst}

    tta = TTAPredictor(cfg, predictor=ManyBox(), flip=False)
    out = tta(np.zeros((20, 20, 3), np.uint8))["instances"]
    assert len(out.scores) == 1 and out.scores[0] == np.float32(0.9)


def test_resample_crop_identity_and_paste_oracle():
    from ampis_tpu.engine.tta import _resample_crop
    rng = np.random.RandomState(3)
    mask = rng.rand(28, 28).astype(np.float32)
    src = np.array([3.2, 5.7, 21.9, 17.3], np.float32)
    # same box -> exact identity (grid centers land on themselves)
    np.testing.assert_allclose(_resample_crop(mask, src, src), mask,
                               atol=1e-5)
    # oracle: paste the crop onto a 28x28 image; with dst box (0,0,28,28)
    # the resample grid centers ARE that image's pixel centers, so both
    # paths evaluate the same bilinear field at the same points
    import jax
    from ampis_tpu.ops.paste import paste_masks
    dense = np.asarray(jax.jit(
        lambda m, b: paste_masks(m, b, (28, 28), threshold=None))(
            mask[None], src[None]))[0]
    ours = _resample_crop(mask, src, np.array([0, 0, 28, 28], np.float32))
    np.testing.assert_allclose(ours, dense, atol=1e-4)


def test_vote_merge_singleton_is_identity():
    from ampis_tpu.engine.tta import vote_merge
    rng = np.random.RandomState(0)
    boxes = np.array([[2.0, 3.0, 12.0, 11.0], [40.0, 40.0, 50.0, 50.0]],
                     np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    masks = rng.rand(2, 28, 28).astype(np.float32)
    vb, vm, vs = vote_merge(boxes, scores, masks, np.array([0, 1]), 0.5)
    np.testing.assert_allclose(vb, boxes, atol=1e-5)
    np.testing.assert_allclose(vm, masks, atol=1e-5)


def test_vote_merge_pools_cluster():
    from ampis_tpu.engine.tta import vote_merge
    # two near-identical detections of one object: voted box is the
    # score-weighted mean; voted mask blends both members
    boxes = np.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0]],
                     np.float32)
    scores = np.array([0.6, 0.4], np.float32)
    masks = np.stack([np.ones((28, 28), np.float32),
                      np.zeros((28, 28), np.float32)])
    vb, vm, vs = vote_merge(boxes, scores, masks, np.array([0]), 0.5)
    np.testing.assert_allclose(vb[0], 0.6 * boxes[0] + 0.4 * boxes[1],
                               atol=1e-5)
    # member 0 contributes ones (weight .6), member 1 zeros: interior of
    # the voted mask sits around 0.6 (edges lose a little to the 1px
    # offset resampling out of member 0's box)
    assert 0.55 <= vm[0, 14, 14] <= 0.61


def test_tta_vote_end_to_end():
    """vote_iou on the 4-view stub: still one detection, same box (all
    views agree), mask is the blend of all four views' crops."""
    tta, stub = _make_tta(flip=True, vflip=True)
    tta.vote_iou = 0.5
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 200
    out = tta(img)["instances"]
    assert len(out.scores) == 1
    np.testing.assert_allclose(out.pred_boxes[0], [12, 10, 30, 20],
                               atol=1e-4)
    m = np.asarray(out.pred_masks.masks)[0]
    # views mark left half (identity, v) and right half (h, hv) after
    # inversion; scores are ~equal so the vote is ~0.5 everywhere
    assert abs(m[14, 5] - 0.5) < 0.05 and abs(m[14, 22] - 0.5) < 0.05


def test_ensemble_extra_predictors_join_merge():
    """A second predictor's detections enter the same NMS merge: disjoint
    boxes all survive; coincident boxes collapse to the higher score."""
    cfg = get_cfg()
    cfg.TEST.DETECTIONS_PER_IMAGE = 10

    def mk(box, score):
        class P:
            def __init__(self):
                self.cfg = cfg

            def __call__(self, image):
                b = np.asarray([box], np.float32)
                inst = Instances(
                    image.shape[:2], pred_boxes=b,
                    scores=np.asarray([score], np.float32),
                    pred_classes=np.zeros(1, np.int64),
                    pred_masks=SoftMasks(np.ones((1, 28, 28), np.float32),
                                         b, image.shape[:2]))
                return {"instances": inst}
        return P()

    # disjoint -> both survive
    tta = TTAPredictor(cfg, predictor=mk([0, 0, 5, 5], 0.9), flip=False,
                       extra_predictors=[mk([20, 20, 25, 25], 0.8)])
    out = tta(np.zeros((40, 40, 3), np.uint8))["instances"]
    assert len(out.scores) == 2
    # coincident -> one survivor, the higher-score model's
    tta = TTAPredictor(cfg, predictor=mk([0, 0, 5, 5], 0.7), flip=False,
                       extra_predictors=[mk([0, 0, 5, 5], 0.95)])
    out = tta(np.zeros((40, 40, 3), np.uint8))["instances"]
    assert len(out.scores) == 1 and out.scores[0] == np.float32(0.95)


def test_wbf_scores_demote_single_view():
    """score_mode='wbf': the 4-view-confirmed detection keeps ~its mean
    score; vote_merge's n_views scaling demotes a 1-member cluster."""
    from ampis_tpu.engine.tta import vote_merge
    boxes = np.array([[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5],
                      [40, 40, 50, 50]], np.float32)
    scores = np.array([0.9, 0.7, 0.8], np.float32)
    masks = np.ones((3, 28, 28), np.float32)
    vb, vm, vs = vote_merge(boxes, scores, masks, np.array([0, 2]), 0.5,
                            n_views=2)
    np.testing.assert_allclose(vs[0], 0.8, atol=1e-6)   # mean(.9,.7) * 2/2
    np.testing.assert_allclose(vs[1], 0.4, atol=1e-6)   # 0.8 * 1/2


def test_tta_wbf_end_to_end_resorts():
    tta, stub = _make_tta(flip=True, vflip=True, vote_iou=0.5,
                          score_mode="wbf")
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:20, 12:30] = 200
    out = tta(img)["instances"]
    assert len(out.scores) == 1
    # all 4 views agree: wbf score = mean(0.51..0.54) * 4/4
    np.testing.assert_allclose(out.scores[0], np.mean([0.51, 0.52,
                                                       0.53, 0.54]),
                               atol=1e-6)
    np.testing.assert_allclose(out.pred_boxes[0], [12, 10, 30, 20],
                               atol=1e-4)


def test_wbf_requires_vote():
    import pytest
    cfg = get_cfg()
    with pytest.raises(ValueError):
        TTAPredictor(cfg, predictor=_StubPredictor(cfg), score_mode="wbf")


def test_maskness_rescore():
    from ampis_tpu.engine.predictor import maskness_rescore
    scores = np.array([0.8, 0.6, 0.9], np.float32)
    masks = np.stack([
        np.full((28, 28), 0.9, np.float32),    # maskness 0.9
        np.full((28, 28), 0.3, np.float32),    # no fg pixels -> 0
        np.where(np.arange(28 * 28).reshape(28, 28) % 2 == 0,
                 1.0, 0.0).astype(np.float32),  # fg pixels all 1.0 -> 1.0
    ])
    # alpha=0 is a no-op
    np.testing.assert_array_equal(maskness_rescore(scores, masks, 0.0),
                                  scores)
    out = maskness_rescore(scores, masks, 1.0)
    np.testing.assert_allclose(out, [0.8 * 0.9, 0.0, 0.9], atol=1e-6)
    # alpha=0.5 takes the square root of maskness
    out = maskness_rescore(scores, masks, 0.5)
    np.testing.assert_allclose(out, [0.8 * 0.9 ** 0.5, 0.0, 0.9],
                               atol=1e-6)
    # empty input passes through
    assert len(maskness_rescore(np.zeros(0, np.float32),
                                np.zeros((0, 28, 28), np.float32), 1.0)) == 0
    # negative alpha would turn zero-foreground masks into inf scores
    with pytest.raises(ValueError):
        maskness_rescore(scores, masks, -1.0)


# ---------------------------------------------------------- TiledPredictor

from ampis_tpu.engine.tta import TiledPredictor, _tile_origins


def test_tile_origins_cover_and_clamp():
    # 100 with tile 40 stride 30: 0, 30, 60 (last clamped from 90)
    assert _tile_origins(100, 40, 30) == [0, 30, 60]
    # exact fit: no duplicate of the clamped last origin
    assert _tile_origins(80, 40, 40) == [0, 40]
    # image smaller than the tile: single origin
    assert _tile_origins(30, 40, 30) == [0]
    for extent, tile, stride in [(100, 40, 30), (97, 32, 20), (513, 512,
                                                               384)]:
        org = _tile_origins(extent, tile, stride)
        assert org[0] == 0 and org[-1] == max(extent - tile, 0)
        assert all(b - a <= stride for a, b in zip(org, org[1:]))


class _GridStub:
    """Reports one detection per known blob center that falls inside the
    view; boxes in view coordinates."""

    def __init__(self, cfg, centers, size=6):
        self.cfg = cfg
        self.centers = centers
        self.size = size
        self.calls = 0

    def __call__(self, image):
        self.calls += 1
        h, w = image.shape[:2]
        oy, ox = image[0, 0, 1], image[0, 0, 2]  # origin smuggled in px
        half = self.size / 2
        boxes, masks = [], []
        for (cy, cx) in self.centers:
            vy, vx = cy - oy, cx - ox
            if 0 <= vy - half and vy + half <= h \
                    and 0 <= vx - half and vx + half <= w:
                boxes.append([vx - half, vy - half, vx + half, vy + half])
                masks.append(np.ones((28, 28), np.float32))
        n = len(boxes)
        inst = Instances(
            (h, w),
            pred_boxes=np.asarray(boxes, np.float32).reshape(n, 4),
            scores=np.full(n, 0.9, np.float32),
            pred_classes=np.zeros(n, np.int64),
            pred_masks=SoftMasks(
                np.asarray(masks, np.float32).reshape(n, 28, 28),
                np.asarray(boxes, np.float32).reshape(n, 4), (h, w)))
        return {"instances": inst}


def test_tiled_predictor_restores_global_coords():
    cfg = get_cfg()
    cfg.TEST.DETECTIONS_PER_IMAGE = 50
    h, w = 100, 160
    centers = [(20, 30), (50, 80), (90, 150), (10, 140)]
    img = np.zeros((h, w, 3), np.float32)

    # encode origins: fill channels 1/2 with the GLOBAL y/x of each pixel
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :, 1] = yy
    img[:, :, 2] = xx

    stub = _GridStub(get_cfg(), centers)
    tp = TiledPredictor(cfg, tile=64, overlap=24, predictor=stub)
    out = tp(img)["instances"]
    got = {(round(float((b[1] + b[3]) / 2)), round(float((b[0] + b[2]) / 2)))
           for b in np.asarray(out.pred_boxes)}
    assert got == set(centers)
    assert stub.calls == len(_tile_origins(h, 64, 40)) * \
        len(_tile_origins(w, 64, 40))


def test_tiled_predictor_single_tile_small_image():
    cfg = get_cfg()
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    h, w = 40, 50
    img = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :, 1] = yy
    img[:, :, 2] = xx
    stub = _GridStub(get_cfg(), [(20, 25)])
    tp = TiledPredictor(cfg, tile=512, overlap=128, predictor=stub)
    out = tp(img)["instances"]
    assert len(np.asarray(out.pred_boxes)) == 1
    assert stub.calls == 1


def test_tiled_predictor_drops_clipped_interior_detections():
    """A blob centered on an interior tile edge is clipped in the tiles
    whose edge cuts it; only the tile seeing it whole may report it, so
    the merged output still has exactly one detection per blob."""
    cfg = get_cfg()
    cfg.TEST.DETECTIONS_PER_IMAGE = 50
    h, w = 100, 100
    # blob centered exactly on the x=60 interior edge of tile (0..64)
    centers = [(30, 60)]
    img = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :, 1] = yy
    img[:, :, 2] = xx

    class ClippingStub(_GridStub):
        """Also reports PARTIAL blobs touching the view edge (like a real
        model seeing half an object), in view coordinates."""

        def __call__(self, image):
            self.calls += 1
            hh, ww = image.shape[:2]
            oy, ox = image[0, 0, 1], image[0, 0, 2]
            half = self.size / 2
            boxes, masks = [], []
            for (cy, cx) in self.centers:
                vy, vx = cy - oy, cx - ox
                x0, y0 = vx - half, vy - half
                x1, y1 = vx + half, vy + half
                if x1 <= 0 or y1 <= 0 or x0 >= ww or y0 >= hh:
                    continue
                boxes.append([max(x0, 0), max(y0, 0),
                              min(x1, ww), min(y1, hh)])
                masks.append(np.ones((28, 28), np.float32))
            n = len(boxes)
            inst = Instances(
                (hh, ww),
                pred_boxes=np.asarray(boxes, np.float32).reshape(n, 4),
                scores=np.full(n, 0.9, np.float32),
                pred_classes=np.zeros(n, np.int64),
                pred_masks=SoftMasks(
                    np.asarray(masks, np.float32).reshape(n, 28, 28),
                    np.asarray(boxes, np.float32).reshape(n, 4),
                    (hh, ww)))
            return {"instances": inst}

    stub = ClippingStub(get_cfg(), centers)
    tp = TiledPredictor(cfg, tile=64, overlap=28, predictor=stub)
    out = tp(img)["instances"]
    boxes = np.asarray(out.pred_boxes)
    assert len(boxes) == 1
    cy = (boxes[0, 1] + boxes[0, 3]) / 2
    cx = (boxes[0, 0] + boxes[0, 2]) / 2
    assert (round(float(cy)), round(float(cx))) == centers[0]
