"""Input pipeline: resize/normalize/pad parity.

The matmul-based separable resize must reproduce
jax.image.resize(method='bilinear', antialias=True) — the stand-in for
detectron2's ResizeShortestEdge PIL-bilinear resize (reference
data_utils.py:174 via DatasetMapper [dep], SURVEY.md §2b).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampis_tpu.input.transforms import (_resize_matmul, get_resize_shape,
                                        pad_to_canvas_shape,
                                        preprocess_image)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((1024, 1536), (800, 1200)),   # powder SEM downscale
    ((481, 645), (800, 1072)),     # spheroidite upscale
    ((100, 80), (50, 77)),         # anisotropic
])
def test_resize_matmul_matches_jax_image(in_shape, out_shape):
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(*in_shape, 3).astype(np.float32) * 255)
    ref = np.asarray(jax.image.resize(img, (*out_shape, 3),
                                      method="bilinear", antialias=True))
    out = np.asarray(_resize_matmul(img, out_shape))
    # identical taps; the resize runs in bf16 (pixel-value rounding < 2
    # on a 0..255 scale, below the bf16 quantization the backbone applies
    # to the normalized input anyway — its step is ~1.0 at magnitude 128)
    np.testing.assert_allclose(out, ref, atol=2.0)
    assert np.abs(out - ref).mean() < 0.5


def test_resize_shape_and_canvas():
    # detectron2 ResizeShortestEdge semantics: shortest edge to 800 unless
    # the long edge would exceed 1333
    assert get_resize_shape(1024, 1536, 800, 1333) == (800, 1200)
    assert get_resize_shape(480, 640, 800, 1333) == (800, 1067)
    assert get_resize_shape(500, 2000, 800, 1333) == (333, 1333)
    assert pad_to_canvas_shape(800, 1200) == (800, 1216)


def test_preprocess_grayscale_and_padding():
    rs = np.random.RandomState(1)
    raw = rs.randint(0, 255, (64, 96), np.uint8)
    new_shape = get_resize_shape(64, 96, 64, 128)
    canvas = pad_to_canvas_shape(*new_shape)
    out = np.asarray(preprocess_image(
        jnp.asarray(raw), new_shape, canvas,
        (103.53, 116.28, 123.675), (1.0, 1.0, 1.0)))
    assert out.shape == (*canvas, 3)
    # padding region is exactly zero
    nh, nw = new_shape
    assert (out[nh:] == 0).all() and (out[:, nw:] == 0).all()
    assert np.isfinite(out).all()
