"""Pallas kernel tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from ampis_tpu.ops.pallas_kernels import combine_pooled
from ampis_tpu.ops.roi_align import (assign_levels, pack_feature_levels,
                                     roi_align_packed)


def test_combine_pooled_matches_numpy():
    rs = np.random.RandomState(0)
    n, t, c = 512, 16, 128
    rows = jnp.asarray(rs.rand(n, t * c).astype(np.float32))
    w = jnp.asarray(rs.rand(n, 128).astype(np.float32))
    w = w.at[:, t:].set(0.0)
    got = np.asarray(combine_pooled(rows, w, channels=c, block=256,
                                    interpret=True))
    want = np.zeros((n, c), np.float32)
    rn = np.asarray(rows)
    wn = np.asarray(w)
    for k in range(t):
        want += rn[:, k * c:(k + 1) * c] * wn[:, k:k + 1]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_combine_pooled_grad():
    rs = np.random.RandomState(1)
    n, t, c = 256, 16, 128
    rows = jnp.asarray(rs.rand(n, t * c).astype(np.float32))
    w = jnp.asarray(np.pad(rs.rand(n, t), ((0, 0), (0, 128 - t))).astype(
        np.float32))

    def loss(rows, w):
        return combine_pooled(rows, w, channels=c, block=256,
                              interpret=True).sum()

    g_rows, g_w = jax.grad(loss, argnums=(0, 1))(rows, w)
    # analytic: d/d rows[:, k*c + j] = w[:, k]; d/d w[:, k] = sum_j rows
    want_rows = np.repeat(np.asarray(w)[:, :t], c, axis=1)
    np.testing.assert_allclose(np.asarray(g_rows), want_rows, rtol=1e-5)
    want_w = np.stack(
        [np.asarray(rows)[:, k * c:(k + 1) * c].sum(1) for k in range(t)], 1)
    np.testing.assert_allclose(np.asarray(g_w)[:, :t], want_w, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w)[:, t:], 0.0)


def test_roi_align_pallas_path_matches_fallback():
    """The Pallas combine path must agree with the sliced-combine path."""
    rs = np.random.RandomState(2)
    feat = jnp.asarray(rs.rand(32, 40, 128).astype(np.float32))
    # 256 boxes so n_bins = 256*49 is block-aligned
    boxes = rs.rand(256, 4) * 80
    boxes[:, 2:] = boxes[:, :2] + rs.rand(256, 2) * 60 + 4
    boxes = jnp.asarray(boxes, jnp.float32)
    levels = jnp.zeros(256, jnp.int32)
    packed = pack_feature_levels([feat])

    kwargs = dict(strides=(4,), output_size=7, max_sr=2, sampling_ratio=0,
                  chunk=256)
    ref = roi_align_packed(packed, boxes, levels, use_pallas=False, **kwargs)
    # interpret-mode pallas on CPU
    import ampis_tpu.ops.pallas_kernels as pk
    orig = pk._combine_call

    def interp_call(rows, w, channels, block, interpret):
        return orig(rows, w, channels, block, True)

    pk._VJP_CACHE.clear()
    pk._combine_call = interp_call
    try:
        got = roi_align_packed(packed, boxes, levels, use_pallas=True,
                               **kwargs)
    finally:
        pk._combine_call = orig
        pk._VJP_CACHE.clear()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
