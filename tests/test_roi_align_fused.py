"""Window-DMA Pallas RoIAlign vs. the gather-based reference path.

The fused kernel (ops.roi_align_fused) must reproduce
ops.roi_align.roi_align_packed — itself golden-tested against a numpy
ROIAlignV2 oracle in test_ops.py — exactly, for every RoI whose sampling
footprint fits the window. Runs in Pallas interpret mode on the CPU test
backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampis_tpu.ops.roi_align import (assign_levels, pack_feature_levels,
                                     roi_align_packed)
from ampis_tpu.ops.roi_align_fused import (concat_feature_levels,
                                           roi_align_windows,
                                           roi_align_windows_trainable)

STRIDES = (4, 8, 16, 32)
SHAPES = [(52, 80), (26, 40), (13, 20), (7, 10)]  # canvas 208x320


def _random_boxes(rs, n, max_side=120):
    cx = rs.rand(n) * 280 + 20
    cy = rs.rand(n) * 180 + 14
    w = rs.rand(n) * max_side + 6
    h = rs.rand(n) * max_side + 6
    return np.stack([np.clip(cx - w / 2, 0, 320),
                     np.clip(cy - h / 2, 0, 208),
                     np.clip(cx + w / 2, 0, 320),
                     np.clip(cy + h / 2, 0, 208)], -1).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    rs = np.random.RandomState(0)
    b, c = 2, 256
    feats = [jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
             for (h, w) in SHAPES]
    boxes = jnp.asarray(_random_boxes(rs, 64))
    img_idx = jnp.asarray(rs.randint(0, b, 64), jnp.int32)
    valid = jnp.asarray(rs.rand(64) > 0.1)
    return b, feats, boxes, img_idx, valid


@pytest.mark.parametrize("res", [7, 14])
@pytest.mark.parametrize("window", [24, 32])
def test_matches_gather_path(setup, res, window):
    b, feats, boxes, img_idx, valid = setup
    levels = assign_levels(boxes)

    feature_list = [feats[lv][i] for i in range(b) for lv in range(4)]
    packed = pack_feature_levels(feature_list)
    fb = jnp.where(valid[:, None], boxes, 0.0)
    ref = np.asarray(roi_align_packed(
        packed, fb, img_idx * 4 + levels, strides=STRIDES * b,
        output_size=res, max_sr=2, sampling_ratio=0, chunk=64))
    ref = ref * np.asarray(valid)[:, None, None, None]

    pack = concat_feature_levels(feats, window=window)
    out = np.asarray(roi_align_windows(
        pack, boxes, img_idx, levels, valid, strides=STRIDES,
        output_size=res, max_sr=2, window=window, interpret=True))

    # boxes whose level footprint fits the window must be exact
    lv = np.asarray(levels)
    bx = np.asarray(boxes)
    span = np.maximum(bx[:, 2] - bx[:, 0], bx[:, 3] - bx[:, 1]) \
        / np.asarray(STRIDES)[lv]
    fits = span < window - 2.5  # window - 2 is the demotion threshold
    assert fits.sum() > 35
    np.testing.assert_allclose(out[fits], ref[fits], atol=2e-5)
    # oversized footprints degrade gracefully (clamped, finite, masked)
    assert np.isfinite(out).all()
    assert (out[~np.asarray(valid)] == 0).all()


def test_bf16_and_padding_rows(setup):
    b, feats, boxes, img_idx, valid = setup
    feats16 = [f.astype(jnp.bfloat16) for f in feats]
    levels = assign_levels(boxes)
    pack = concat_feature_levels(feats16, window=32)
    out = np.asarray(roi_align_windows(
        pack, boxes, img_idx, levels, valid, strides=STRIDES,
        output_size=7, max_sr=2, window=32,
        interpret=True).astype(jnp.float32))
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 0


def test_oversized_footprint_uses_lowpassed_level(setup):
    """Elongated boxes beyond the window pool from the 2x-avgpooled copy.

    The result is ROIAlign on a low-passed map: close to the exact value
    on smooth features, not a hard edge clamp.
    """
    rs = np.random.RandomState(7)
    b, c = 1, 256
    # smooth feature maps so low-pass is a good approximation
    base = rs.randn(b, 7, 11, c).astype(np.float32)
    feats = []
    for (h, w) in SHAPES:
        up = np.kron(base[:, :, :, :], np.ones((1, 8, 8, 1), np.float32))
        feats.append(jnp.asarray(up[:, :h, :w, :]))
    # aspect-8 box: 180x22 px -> sqrt_area 63 -> p2 (stride 4), x-span 45
    boxes = jnp.asarray([[40.0, 80.0, 220.0, 102.0]])
    img_idx = jnp.zeros(1, jnp.int32)
    levels = assign_levels(boxes)
    assert int(levels[0]) == 0  # assigned p2: footprint 45 >> 32

    feature_list = [feats[lv][0] for lv in range(4)]
    packed = pack_feature_levels(feature_list)
    exact = np.asarray(roi_align_packed(
        packed, boxes, levels, strides=STRIDES, output_size=7, max_sr=2,
        sampling_ratio=0, chunk=2))

    pack = concat_feature_levels(feats, window=32)
    out = np.asarray(roi_align_windows(
        pack, boxes, img_idx, levels, jnp.ones(1, bool), strides=STRIDES,
        output_size=7, max_sr=2, window=32, interpret=True))
    # low-passed pooling tracks the exact result on average (a hard clamp,
    # which reads only a 32-px strip of the 45-px footprint, does not)
    denom = np.abs(exact).max()
    assert np.abs(out - exact).mean() / denom < 0.05
    assert np.abs(out - exact).max() / denom < 0.5


def test_p5_clipped_giant_box_demotes(setup):
    """Full-canvas boxes clip to p5 with footprints > 32 px: they must
    pool from p5's avgpooled copy, not clamp (every level has one)."""
    rs = np.random.RandomState(3)
    base = rs.randn(1, 7, 11, 256).astype(np.float32)
    feats = []
    for (h, w) in SHAPES:
        up = np.kron(base, np.ones((1, 8, 8, 1), np.float32))
        feats.append(jnp.asarray(up[:, :h, :w, :]))
    # no mid levels can take it: sqrt_area 283 -> clipped to p5 (stride
    # 32); at canvas 208x320 the p5 footprint is 320/32 = 10 < 32, so
    # synthesize level-coords directly via a long thin box instead:
    # 300x270 px -> p5? sqrt_area 284 -> 4+log2(284/224) = 4.3 -> lvl 4
    boxes = jnp.asarray([[4.0, 4.0, 304.0, 204.0]])
    levels = assign_levels(boxes)
    assert int(levels[0]) >= 2  # lands on p4/p5

    feature_list = [feats[lv][0] for lv in range(4)]
    packed = pack_feature_levels(feature_list)
    exact = np.asarray(roi_align_packed(
        packed, boxes, levels, strides=STRIDES, output_size=7, max_sr=2,
        sampling_ratio=0, chunk=2))
    pack = concat_feature_levels(feats, window=32)
    assert len(pack[1]) == 8  # pooled copies exist for all 4 levels
    out = np.asarray(roi_align_windows(
        pack, boxes, jnp.zeros(1, jnp.int32), levels, jnp.ones(1, bool),
        strides=STRIDES, output_size=7, max_sr=2, window=32,
        interpret=True))
    denom = np.abs(exact).max()
    # small footprint here (fits window): exact; the geometric assertion
    # that matters is the 8-entry pack. For footprint > window coverage
    # see test_oversized_footprint_uses_lowpassed_level.
    assert np.abs(out - exact).max() / denom < 0.05


def test_trainable_gradients_match_gather_path(setup):
    """The custom-VJP feature gradient must equal the gather path's.

    Both compute d(loss)/d(features) of the same bilinear pooling; the
    fused backward scatter-adds per-RoI window grads built from the hat
    weights.
    """
    b, feats, boxes, img_idx, valid = setup
    boxes = boxes[:16]
    img_idx = img_idx[:16]
    valid = valid[:16]
    levels = assign_levels(boxes)
    # restrict to in-window boxes so both paths are numerically identical
    span = np.maximum(
        np.asarray(boxes)[:, 2] - np.asarray(boxes)[:, 0],
        np.asarray(boxes)[:, 3] - np.asarray(boxes)[:, 1]) \
        / np.asarray(STRIDES)[np.asarray(levels)]
    keep = jnp.asarray(span < 29.5) & valid

    rs = np.random.RandomState(5)
    cot = jnp.asarray(rs.randn(16, 7, 7, 256).astype(np.float32))

    def loss_fused(feats_in):
        pack = concat_feature_levels(feats_in, window=32)
        out = roi_align_windows_trainable(
            pack, boxes, img_idx, levels, keep, strides=STRIDES,
            output_size=7, max_sr=2, window=32, interpret=True)
        return jnp.sum(out * cot)

    def loss_gather(feats_in):
        feature_list = [feats_in[lv][i] for i in range(b)
                        for lv in range(4)]
        packed = pack_feature_levels(feature_list)
        fb = jnp.where(keep[:, None], boxes, 0.0)
        out = roi_align_packed(
            packed, fb, img_idx * 4 + levels, strides=STRIDES * b,
            output_size=7, max_sr=2, sampling_ratio=0, chunk=16)
        out = out * keep[:, None, None, None]
        return jnp.sum(out * cot)

    v1, g1 = jax.value_and_grad(loss_fused)(feats)
    v2, g2 = jax.value_and_grad(loss_gather)(feats)
    assert np.allclose(float(v1), float(v2), rtol=1e-5)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-4, rtol=1e-4)


def test_small_canvas_levels_pad_to_window():
    # levels smaller than the window (e.g. tiny canvases) must still pool
    rs = np.random.RandomState(1)
    b, c = 1, 256
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2)]
    feats = [jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
             for (h, w) in shapes]
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0], [0.0, 0.0, 60.0, 60.0]])
    img_idx = jnp.zeros(2, jnp.int32)
    levels = assign_levels(boxes)
    valid = jnp.ones(2, bool)

    feature_list = [feats[lv][0] for lv in range(4)]
    packed = pack_feature_levels(feature_list)
    ref = np.asarray(roi_align_packed(
        packed, boxes, levels, strides=STRIDES, output_size=7, max_sr=2,
        sampling_ratio=0, chunk=2))

    pack = concat_feature_levels(feats, window=32)
    out = np.asarray(roi_align_windows(
        pack, boxes, img_idx, levels, valid, strides=STRIDES,
        output_size=7, max_sr=2, window=32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_two_tier_matches_single_tier():
    """small_window fast path == full-window pooling, bit-for-bit.

    Includes RoIs pressed against level edges (the origin clamp differs
    between tiers) and RoIs exactly at the small/large threshold.
    """
    rs = np.random.RandomState(11)
    b, c = 2, 64
    feats = [jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
             for (h, w) in SHAPES]
    # corner/edge boxes + threshold-straddling sizes (span 12..18 on p2)
    edge = np.asarray([
        [0.0, 0.0, 40.0, 40.0],          # top-left corner
        [280.0, 168.0, 318.0, 206.0],    # bottom-right corner
        [300.0, 4.0, 319.0, 60.0],       # right edge, tall
        [2.0, 190.0, 70.0, 207.0],       # bottom edge, wide
        [100.0, 100.0, 148.0, 148.0],    # span 12 on p2: small tier
        [100.0, 100.0, 156.0, 156.0],    # span 14 on p2: boundary
        [100.0, 100.0, 172.0, 172.0],    # span 18 on p2: large tier
    ], np.float32)
    boxes = jnp.asarray(np.concatenate([edge, _random_boxes(rs, 57)]))
    n = boxes.shape[0]
    img_idx = jnp.asarray(rs.randint(0, b, n), jnp.int32)
    valid = jnp.asarray(rs.rand(n) > 0.1)
    levels = assign_levels(boxes)
    pack = concat_feature_levels(feats, window=32)

    kw = dict(strides=STRIDES, output_size=7, max_sr=2, window=32,
              interpret=True)
    two = np.asarray(roi_align_windows(pack, boxes, img_idx, levels, valid,
                                       small_window=16, **kw))
    one = np.asarray(roi_align_windows(pack, boxes, img_idx, levels, valid,
                                       small_window=None, **kw))
    np.testing.assert_allclose(two, one, atol=1e-6)
