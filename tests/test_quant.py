"""int8 conv/deconv (dynamic + static/calibrated) vs the float ops.

Quantization error bound: symmetric per-channel int8 keeps relative
error ~0.5-1% for well-conditioned activations; the tests use realistic
magnitude distributions and assert against that budget (the model-level
question — mask AP impact — is measured on a trained powder model, see
docs/parity.md).
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ampis_tpu.ops.quant import (conv2d_int8, conv_transpose2x2_int8,
                                 quantize_tensor)


def test_quantize_roundtrip_scale():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(64, 64).astype(np.float32)) * 3.7
    xq, s = quantize_tensor(x)
    err = np.abs(np.asarray(xq, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) * 0.5 + 1e-6


def test_conv2d_int8_close_to_float():
    rs = np.random.RandomState(1)
    x = jnp.asarray(np.abs(rs.randn(6, 14, 14, 128)).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, 128, 128) / 34.0).astype(np.float32))
    b = jnp.asarray((rs.randn(128) * 0.1).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = np.asarray(jnp.maximum(ref, 0.0))
    out = np.asarray(conv2d_int8(x, w, b, relu=True))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.02 * scale


def test_deconv_int8_matches_conv_transpose():
    rs = np.random.RandomState(2)
    x = jnp.asarray(np.abs(rs.randn(4, 14, 14, 128)).astype(np.float32))
    w = jnp.asarray((rs.randn(2, 2, 128, 128) / 16.0).astype(np.float32))
    b = jnp.asarray((rs.randn(128) * 0.1).astype(np.float32))
    ref = jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = np.asarray(jnp.maximum(ref, 0.0))
    out = np.asarray(conv_transpose2x2_int8(x, w, b, relu=True))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.02 * scale


def test_mask_head_int8_end_to_end_close():
    """Whole int8 mask head vs float head on one set of params."""
    from ampis_tpu.models.roi_heads import MaskHead
    rs = np.random.RandomState(3)
    x = jnp.asarray(np.abs(rs.randn(8, 14, 14, 256)).astype(np.float32))
    head = MaskHead(num_classes=1, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(head.apply(params, x))
    out = np.asarray(head.apply(params, x, int8=True))
    # logits feed a sigmoid thresholded at 0.5: check logit error stays
    # small relative to the logit spread
    spread = ref.std() + 1e-6
    assert np.abs(out - ref).max() < 0.2 * spread or \
        np.abs(out - ref).max() < 0.05


def test_build_model_threads_int8_flag():
    """cfg.TPU.INT8_MASK_HEAD reaches MaskRCNN.int8_mask_head."""
    from ampis_tpu.engine.config import get_cfg
    from ampis_tpu.models.mask_rcnn import build_model
    cfg = get_cfg()
    assert build_model(cfg).int8_mask_head is False
    cfg.TPU.INT8_MASK_HEAD = True
    assert build_model(cfg).int8_mask_head is True
    cfg.TPU.INT8_MASK_HEAD = "static"
    assert build_model(cfg).int8_mask_head == "static"


def test_mask_head_calib_then_static_close():
    """calib pass records scales; static pass matches float closely.

    The static path (calibrated scales, quantize fused into epilogues)
    is the production int8 mode — dynamic per-tensor amax measured
    slower than bf16 end-to-end on v5e (docs/performance.md).
    """
    from ampis_tpu.models.roi_heads import MaskHead
    rs = np.random.RandomState(4)
    x = jnp.asarray(np.abs(rs.randn(8, 14, 14, 256)).astype(np.float32))
    head = MaskHead(num_classes=1, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(head.apply(params, x))

    out_f, mut = head.apply(params, x, int8="calib", mutable=["quant"])
    # calib mode itself is the float path
    np.testing.assert_allclose(np.asarray(out_f), ref, rtol=1e-5, atol=1e-5)
    scales = jax.tree.leaves(mut["quant"])
    assert len(scales) == 5 and all(float(s) > 0 for s in scales)

    out_q = np.asarray(head.apply(
        {**params, "quant": mut["quant"]}, x, int8="static"))
    spread = ref.std() + 1e-6
    assert np.abs(out_q - ref).max() < 0.2 * spread or \
        np.abs(out_q - ref).max() < 0.05


def test_calib_running_max_accumulates():
    """Second calib batch with larger activations raises the scales."""
    from ampis_tpu.models.roi_heads import MaskHead
    rs = np.random.RandomState(5)
    x1 = jnp.asarray(np.abs(rs.randn(2, 14, 14, 256)).astype(np.float32))
    head = MaskHead(num_classes=1, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x1)
    _, m1 = head.apply(params, x1, int8="calib", mutable=["quant"])
    _, m2 = head.apply({**params, "quant": m1["quant"]}, x1 * 10.0,
                       int8="calib", mutable=["quant"])
    s1 = jax.tree.leaves(m1["quant"])
    s2 = jax.tree.leaves(m2["quant"])
    assert all(float(b) >= float(a) for a, b in zip(s1, s2))
    assert float(s2[0]) > 5 * float(s1[0])


@pytest.mark.slow
def test_predictor_auto_calibrates_static_int8():
    """DefaultPredictor with INT8_MASK_HEAD='static' calibrates once.

    First call runs a float forward recording activation scales into the
    'quant' collection; subsequent calls reuse them (no recalibration).
    """
    from ampis_tpu.engine.config import get_cfg
    from ampis_tpu.engine.predictor import DefaultPredictor

    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.TPU.INT8_MASK_HEAD = "static"
    cfg.MODEL.WEIGHTS = ""
    pred = DefaultPredictor(cfg)
    assert pred._needs_calib
    img = np.random.RandomState(0).randint(0, 255, (60, 90, 3), np.uint8)
    out = pred(img)
    assert not pred._needs_calib
    assert "quant" in pred.params
    assert len(jax.tree.leaves(pred.params["quant"])) == 5
    assert "pred_masks" in out["instances"].get_fields()
    out2 = pred(img)  # no recalibration path
    assert np.asarray(out2["instances"].scores).shape == \
        np.asarray(out["instances"].scores).shape
