"""Recorded-activation parity fixtures (VERDICT r5 item 4).

tests/fixtures/parity_fixtures.npz holds outputs recorded from
independent implementations — torch CPU ops and explicit float64 loops
(generated once by tools/gen_parity_fixtures.py, committed). These tests
replay the framework's ops against the recordings, so the model-path
parity claims in docs/parity.md stay executable even in environments
without torch.

Coverage (SURVEY.md §7 hard part 2): mask paste vs torch
grid_sample(align_corners=False), the antialias resize vs torch
F.interpolate(bilinear, antialias=True) (PIL semantics of detectron2's
ResizeShortestEdge), RoIAlignV2 vs a float64 loop implementation, the
mask-head deconv vs torch conv_transpose2d, and greedy NMS keep-sets
with engineered score/IoU ties.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures" / "parity_fixtures.npz"


@pytest.fixture(scope="module")
def fx():
    assert FIXTURES.exists(), "run tools/gen_parity_fixtures.py"
    return np.load(FIXTURES)


def test_paste_matches_torch_grid_sample(fx):
    from ampis_tpu.ops.paste import paste_masks
    soft = np.asarray(paste_masks(
        jnp.asarray(fx["paste_masks"]), jnp.asarray(fx["paste_boxes"]),
        tuple(fx["paste_size"]), threshold=None))
    np.testing.assert_allclose(soft, fx["paste_soft"], atol=1e-5)
    # thresholded path: exact on every pixel not razor-close to 0.5
    hard = np.asarray(paste_masks(
        jnp.asarray(fx["paste_masks"]), jnp.asarray(fx["paste_boxes"]),
        tuple(fx["paste_size"]), threshold=0.5))
    confident = np.abs(fx["paste_soft"] - 0.5) > 1e-4
    np.testing.assert_array_equal(hard[confident],
                                  (fx["paste_soft"] > 0.5)[confident])


@pytest.mark.parametrize("tag", ["down", "up", "aniso"])
def test_resize_matches_torch_antialias_bilinear(fx, tag):
    from ampis_tpu.input.transforms import _resize_matmul
    want = fx[f"resize_{tag}"]
    got = np.asarray(_resize_matmul(
        jnp.asarray(fx["resize_img"].astype(np.float32)),
        want.shape[:2]))
    # f32 matmul vs torch's separable kernel: agree to ~1e-3 on a 0..255
    # scale (well under the bf16 compute precision downstream)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_roi_align_matches_f64_loop(fx):
    from ampis_tpu.ops.roi_align import roi_align_single
    stride, out_size, sr = (int(v) for v in fx["ra_meta"])
    got = np.asarray(roi_align_single(
        jnp.asarray(fx["ra_feat"]), jnp.asarray(fx["ra_boxes"]),
        stride=stride, output_size=out_size, max_sr=max(sr, 2),
        sampling_ratio=sr))
    np.testing.assert_allclose(got, fx["ra_out"], atol=1e-4)


def test_deconv_matches_torch_conv_transpose(fx):
    # the checkpoint converter's documented mapping: IOHW -> HWIO with
    # both spatial axes reversed (engine/checkpoint.py::_deconv)
    k = fx["dc_w"].transpose(2, 3, 0, 1)[::-1, ::-1]
    x = fx["dc_x"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
    y = jax.lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(np.ascontiguousarray(k)),
        strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = np.asarray(y) + fx["dc_b"]
    np.testing.assert_allclose(y, fx["dc_y"].transpose(0, 2, 3, 1),
                               atol=1e-5)


@pytest.mark.parametrize("case", [("nms_keep_third", 1.0 / 3.0),
                                  ("nms_keep_half", 0.5)])
def test_nms_engineered_ties(fx, case):
    from ampis_tpu.ops.nms import nms_mask
    key, thr = case
    boxes, scores = fx["nms_boxes"], fx["nms_scores"]
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(len(boxes), bool), thr))
    np.testing.assert_array_equal(got, fx[key])


def test_nms_random_with_score_ties(fx):
    from ampis_tpu.ops.nms import nms_mask
    got = np.asarray(nms_mask(jnp.asarray(fx["nms_rboxes"]),
                              jnp.asarray(fx["nms_rscores"]),
                              jnp.ones(64, bool), 0.5))
    np.testing.assert_array_equal(got, fx["nms_keep_rand"])
