"""Pallas TPU kernels for the RoIAlign hot path.

The pooling pipeline is: XLA gather of corner-packed rows (row-count bound,
see ops.roi_align) followed by the bilinear corner combine + adaptive
sub-grid average. XLA lowers the combine to multi-pass elementwise HLO
(~150 GB/s effective on v5e); this kernel streams the gathered rows through
VMEM exactly once and does the weighted reduction on the VPU.

Layout contract (prepared by ops.roi_align.roi_align_packed):
  rows:  (N_bins, G * 4C) bf16/f32 — G = S*S sub-samples per output bin,
         each sample contributing 4 packed corners of C channels;
  w:     (N_bins, G4P) f32 — per-sample-per-corner weights (already
         includes validity and adaptive-ratio masking), padded to a
         128-lane multiple;
  inv:   (N_bins, 1) f32 — 1 / (sr_y * sr_x).
  out:   (N_bins, C).

Run with interpret=True off-TPU (tests exercise both paths).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _combine_kernel(rows_ref, w_ref, out_ref, *, n_terms, channels):
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t in range(n_terms):
        r = rows_ref[:, t * channels:(t + 1) * channels].astype(jnp.float32)
        w = w_ref[:, t][:, None]
        acc = acc + r * w
    out_ref[:] = acc.astype(out_ref.dtype)


def _combine_call(rows, w, channels, block, interpret):
    n, width = rows.shape
    n_terms = width // channels
    assert n % block == 0, "caller pads N to a block multiple"
    kernel = partial(_combine_kernel, n_terms=n_terms, channels=channels)
    grid = (n // block,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, w.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, channels), rows.dtype),
        interpret=interpret,
    )(rows, w)


_VJP_CACHE = {}


def _combine_vjp(channels, block, interpret):
    """custom_vjp wrapper so the kernel is trainable: the backward pass is
    plain JAX (d rows = g x w broadcast; d w = <g, rows> per term)."""
    key = (channels, block, interpret)
    if key in _VJP_CACHE:
        return _VJP_CACHE[key]

    @jax.custom_vjp
    def f(rows, w):
        return _combine_call(rows, w, channels, block, interpret)

    def fwd(rows, w):
        return f(rows, w), (rows, w)

    def bwd(res, g):
        rows, w = res
        n, width = rows.shape
        t = width // channels
        g32 = g.astype(jnp.float32)
        drows = (g32[:, None, :] * w[:, :t, None]).reshape(
            n, width).astype(rows.dtype)
        dw_t = jnp.einsum(
            "nc,ntc->nt", g32,
            rows.reshape(n, t, channels).astype(jnp.float32))
        dw = jnp.pad(dw_t, ((0, 0), (0, w.shape[1] - t))).astype(w.dtype)
        return drows, dw

    f.defvjp(fwd, bwd)
    _VJP_CACHE[key] = f
    return f


def combine_pooled(rows, w, *, channels, block=256, interpret=False):
    """Weighted reduction of packed corner rows -> pooled features.

    rows: (N, T*C); w: (N, Tp) with Tp >= T, lane-padded (extra weights are
    zero; the adaptive-average 1/count is folded into w by the caller).
    Returns (N, C) in rows.dtype. N must be a multiple of ``block``.
    Differentiable (custom VJP in plain JAX).
    """
    return _combine_vjp(channels, block, interpret)(rows, w)
