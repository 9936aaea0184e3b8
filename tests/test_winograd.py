"""Winograd F(2x2, 3x3) Pallas conv vs jax.lax direct convolution.

Inference-only kernel used by the mask head (ops/winograd.py); must match
the direct 3x3/s1 SAME conv + bias (+relu) to accumulation accuracy in
f32 and to bf16 rounding accuracy in bf16.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampis_tpu.ops.winograd import conv3x3_winograd


def _direct(x, w, b, relu):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(jnp.float32)
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("shape", [(5, 14, 14, 128), (8, 8, 12, 256)])
def test_matches_direct_f32(shape, relu):
    rs = np.random.RandomState(0)
    n, h, w_sp, c = shape
    k = c
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, c, k) / np.sqrt(9 * c))
                    .astype(np.float32))
    b = jnp.asarray(rs.randn(k).astype(np.float32) * 0.1)
    ref = np.asarray(_direct(x, w, b, relu))
    out = np.asarray(conv3x3_winograd(x, w, b, relu=relu, group=4,
                                      interpret=True))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-4)


def test_matches_direct_bf16():
    rs = np.random.RandomState(1)
    n, h, w_sp, c = 6, 14, 14, 256
    x32 = rs.randn(n, h, w_sp, c).astype(np.float32)
    w32 = (rs.randn(3, 3, c, c) / np.sqrt(9 * c)).astype(np.float32)
    b32 = (rs.randn(c) * 0.1).astype(np.float32)
    ref = np.asarray(_direct(jnp.asarray(x32), jnp.asarray(w32),
                             jnp.asarray(b32), True))
    out = np.asarray(conv3x3_winograd(
        jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32),
        jnp.asarray(b32), relu=True, group=4,
        interpret=True).astype(jnp.float32))
    # bf16 inputs: error dominated by the activation cast, same as the
    # direct bf16 conv the model otherwise runs
    direct16 = np.asarray(_direct(
        jnp.asarray(x32, jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(w32, jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(b32), True))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= \
        max(4 * np.abs(direct16 - ref).max(), 0.05 * scale)


def test_padding_rows_dropped():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(3, 6, 6, 128).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, 128, 128) / 34.0).astype(np.float32))
    b = jnp.zeros((128,), jnp.float32)
    out = conv3x3_winograd(x, w, b, relu=False, group=8, interpret=True)
    assert out.shape == (3, 6, 6, 128)
    ref = np.asarray(_direct(x, w, b, False))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)
