"""Kernel unit tests: JAX ops vs straightforward numpy references
(SURVEY.md §4 test strategy, item c)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ampis_tpu.ops import box_ops, nms, paste, roi_align


# ---------------------------------------------------------------------------
# numpy references
# ---------------------------------------------------------------------------

def np_nms(boxes, scores, thresh):
    """Classic greedy NMS (torchvision semantics: suppress iou > thresh)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if np_iou(boxes[i], boxes[j]) > thresh and scores[j] <= scores[i]:
                # only lower-ranked boxes are suppressed; ranking by order
                pass
        # suppress all lower-ranked overlapping
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.maximum(xx2 - xx1, 0)
        h = np.maximum(yy2 - yy1, 0)
        inter = w * h
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a1 + a2 - inter, 1e-12)
        lower = np.zeros(len(boxes), bool)
        # boxes ranked strictly below i
        seen = False
        for j in order:
            if j == i:
                seen = True
                continue
            lower[j] = seen
        suppressed |= (iou > thresh) & lower
    mask = np.zeros(len(boxes), bool)
    mask[keep] = True
    return mask


def np_iou(b1, b2):
    xx1 = max(b1[0], b2[0])
    yy1 = max(b1[1], b2[1])
    xx2 = min(b1[2], b2[2])
    yy2 = min(b1[3], b2[3])
    inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    return inter / max(a1 + a2 - inter, 1e-12)


def np_roi_align(feat, boxes, stride, P, sampling_ratio, max_sr):
    """Direct per-sample-point port of the ROIAlignV2 (aligned) algorithm."""
    H, W, C = feat.shape
    out = np.zeros((len(boxes), P, P, C), np.float32)
    scale = 1.0 / stride
    for n, box in enumerate(boxes):
        x0 = box[0] * scale - 0.5
        y0 = box[1] * scale - 0.5
        x1 = box[2] * scale - 0.5
        y1 = box[3] * scale - 0.5
        roi_w, roi_h = x1 - x0, y1 - y0
        bin_w, bin_h = roi_w / P, roi_h / P
        sr_y = sampling_ratio if sampling_ratio > 0 else \
            int(min(max(np.ceil(roi_h / P), 1), max_sr))
        sr_x = sampling_ratio if sampling_ratio > 0 else \
            int(min(max(np.ceil(roi_w / P), 1), max_sr))
        for ph in range(P):
            for pw in range(P):
                acc = np.zeros(C, np.float32)
                for iy in range(sr_y):
                    y = y0 + ph * bin_h + (iy + 0.5) * bin_h / sr_y
                    for ix in range(sr_x):
                        x = x0 + pw * bin_w + (ix + 0.5) * bin_w / sr_x
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        yy = min(max(y, 0), H - 1)
                        xx = min(max(x, 0), W - 1)
                        y_lo = int(np.floor(yy))
                        x_lo = int(np.floor(xx))
                        y_hi = min(y_lo + 1, H - 1)
                        x_hi = min(x_lo + 1, W - 1)
                        if y_lo >= H - 1:
                            y_lo = y_hi = H - 1
                            yy = float(y_lo)
                        if x_lo >= W - 1:
                            x_lo = x_hi = W - 1
                            xx = float(x_lo)
                        ly, lx = yy - y_lo, xx - x_lo
                        acc += ((1 - ly) * (1 - lx) * feat[y_lo, x_lo]
                                + (1 - ly) * lx * feat[y_lo, x_hi]
                                + ly * (1 - lx) * feat[y_hi, x_lo]
                                + ly * lx * feat[y_hi, x_hi])
                out[n, ph, pw] = acc / (sr_y * sr_x)
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestBoxOps:
    def test_deltas_roundtrip(self):
        rs = np.random.RandomState(0)
        src = rs.rand(20, 4) * 50
        src[:, 2:] = src[:, :2] + rs.rand(20, 2) * 50 + 1
        tgt = rs.rand(20, 4) * 50
        tgt[:, 2:] = tgt[:, :2] + rs.rand(20, 2) * 50 + 1
        w = (10.0, 10.0, 5.0, 5.0)
        d = box_ops.get_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
        back = box_ops.apply_deltas(d, jnp.asarray(src), w)
        np.testing.assert_allclose(np.asarray(back), tgt, atol=5e-3)

    def test_pairwise_iou(self):
        b1 = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.]])
        b2 = jnp.asarray([[0., 0., 10., 10.], [20., 20., 30., 30.]])
        got = np.asarray(box_ops.pairwise_iou(b1, b2))
        np.testing.assert_allclose(got[0, 0], 1.0)
        np.testing.assert_allclose(got[1, 0], 25 / 175)
        np.testing.assert_allclose(got[:, 1], 0.0)

    def test_clip(self):
        b = jnp.asarray([[-5., -5., 20., 8.]])
        out = np.asarray(box_ops.clip_boxes(b, (10, 15)))
        assert list(out[0]) == [0, 0, 15, 8]


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_greedy_reference(self, seed):
        rs = np.random.RandomState(seed)
        n = 100
        centers = rs.rand(n, 2) * 60
        sizes = rs.rand(n, 2) * 20 + 5
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype(np.float32)
        scores = rs.rand(n).astype(np.float32)
        want = np_nms(boxes, scores, 0.5)
        got = np.asarray(nms.nms_mask(jnp.asarray(boxes),
                                      jnp.asarray(scores),
                                      jnp.ones(n, bool), 0.5))
        assert np.array_equal(got, want)

    def test_invalid_rows_never_kept_or_suppressing(self):
        boxes = jnp.asarray([[0., 0., 10., 10.], [0., 0., 10., 10.],
                             [0., 0., 10., 10.]])
        scores = jnp.asarray([0.9, 0.95, 0.5])
        valid = jnp.asarray([True, False, True])
        got = np.asarray(nms.nms_mask(boxes, scores, valid, 0.5))
        # row1 invalid: kept=False and must not suppress row0
        assert list(got) == [True, False, False]

    def test_batched_nms_classes_dont_interact(self):
        boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.]])
        scores = jnp.asarray([0.9, 0.8])
        same = np.asarray(nms.batched_nms_mask(
            boxes, scores, jnp.asarray([0, 0]), jnp.ones(2, bool), 0.5))
        diff = np.asarray(nms.batched_nms_mask(
            boxes, scores, jnp.asarray([0, 1]), jnp.ones(2, bool), 0.5))
        assert list(same) == [True, False]
        assert list(diff) == [True, True]


class TestRoiAlign:
    @pytest.mark.parametrize("sampling_ratio", [2, 0])
    def test_matches_reference_single_level(self, sampling_ratio):
        rs = np.random.RandomState(0)
        feat = rs.rand(24, 32, 8).astype(np.float32)
        boxes = np.asarray([
            [4., 4., 60., 60.],
            [0., 0., 128., 96.],
            [10.5, 7.25, 30.0, 77.9],
            [100., 80., 120., 95.],   # partially outside
        ], np.float32)
        got = np.asarray(roi_align.roi_align_single(
            jnp.asarray(feat), jnp.asarray(boxes), stride=4, output_size=7,
            max_sr=4, sampling_ratio=sampling_ratio, chunk=2))
        want = np_roi_align(feat, boxes, 4, 7, sampling_ratio, 4)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_multilevel_matches_per_level(self):
        rs = np.random.RandomState(1)
        feats = [rs.rand(32, 40, 4).astype(np.float32),
                 rs.rand(16, 20, 4).astype(np.float32)]
        boxes = np.asarray([[8., 8., 100., 100.],
                            [0., 0., 150., 120.],
                            [20., 30., 60., 50.]], np.float32)
        levels = np.asarray([0, 1, 0], np.int32)
        got = np.asarray(roi_align.multilevel_roi_align(
            [jnp.asarray(f) for f in feats], jnp.asarray(boxes),
            jnp.asarray(levels), strides=(4, 8), output_size=7, max_sr=2,
            sampling_ratio=2, chunk=2))
        for i, (lvl, stride) in enumerate(zip(levels, [4, 8])):
            pass
        for i in range(3):
            stride = [4, 8][levels[i]]
            want = np_roi_align(feats[levels[i]], boxes[i:i + 1], stride,
                                7, 2, 2)
            np.testing.assert_allclose(got[i], want[0], atol=1e-4)

    def test_assign_levels(self):
        boxes = jnp.asarray([
            [0, 0, 50, 50],      # sqrt(area)=50 -> lvl2
            [0, 0, 224, 224],    # -> lvl4
            [0, 0, 1000, 1000],  # -> clamp lvl5
            [0, 0, 112, 112],    # exactly 112 -> lvl3 (1e-8 tiebreak up)
        ], jnp.float32)
        lv = np.asarray(roi_align.assign_levels(boxes))
        assert list(lv) == [0, 2, 3, 1]


class TestRoiAlignGrad:
    def test_grad_finite_with_chunk_padding(self):
        """Chunk-padding rows must not leak 0/0 NaNs into feature grads."""
        import jax
        from ampis_tpu.ops.roi_align import (pack_feature_levels,
                                             roi_align_packed)
        rs = np.random.RandomState(0)
        feat = jnp.asarray(rs.rand(24, 32, 8).astype(np.float32))
        boxes = jnp.asarray([[0., 0., 0., 0.],      # zeroed padding box
                             [10., 10., 50., 60.],
                             [120., 90., 128., 96.]])
        levels = jnp.zeros(3, jnp.int32)

        def loss(f):
            packed = pack_feature_levels([f])
            out = roi_align_packed(packed, boxes, levels, strides=(4,),
                                   output_size=7, max_sr=2,
                                   sampling_ratio=0, chunk=4)
            return out.astype(jnp.float32).sum()

        g = jax.grad(loss)(feat)
        assert bool(jnp.isfinite(g).all())


class TestPaste:
    def test_matches_host_codec(self):
        from ampis_tpu import rle
        rs = np.random.RandomState(0)
        soft = rs.rand(3, 28, 28).astype(np.float32)
        boxes = np.asarray([[5.2, 3.9, 40.7, 35.1],
                            [0., 0., 64., 64.],
                            [50., 50., 70., 70.]], np.float32)  # clipped
        dev = np.asarray(paste.paste_masks(jnp.asarray(soft),
                                           jnp.asarray(boxes), (64, 64)))
        host = rle.decode(rle.paste_masks_to_rle(soft, boxes, (64, 64)))
        host = host.transpose(2, 0, 1).astype(bool)
        assert np.array_equal(dev, host)
