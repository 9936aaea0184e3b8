"""Dynamic int8 conv/deconv vs the float reference ops.

Quantization error bound: symmetric per-channel int8 keeps relative
error ~0.5-1% for well-conditioned activations; the tests use realistic
magnitude distributions and assert against that budget (the model-level
question — mask AP impact — is measured on the trained powder model, see
docs/performance.md).
"""
import jax
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
