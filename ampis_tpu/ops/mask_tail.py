"""Fused mask-head tail: deconv 2x2/s2 + bias + relu + 1x1 predictor.

The mask head's last two layers (reference model: detectron2
MaskRCNNConvUpsampleHead, SURVEY.md §2b — ConvTranspose2d(256, 256, 2, 2)
-> relu -> Conv2d(256, C, 1)) dominate inference HBM traffic when left to
XLA: the (N, 28, 28, 256) deconv activation is 2.6 GB at N=6400/bf16, and
convolutions cannot fuse into convolutions, so it makes a full HBM round
trip just to be reduced to C channels (measured 8.7 ms/iter of a 153 ms
batch-16 program on v5e).

Because stride == kernel size, the deconv never overlaps: output pixel
(2i+di, 2j+dj) is x[i, j] @ Wd[di, dj] — four independent 256x256 matmuls
on the 14x14 grid. This kernel streams RoI tiles through VMEM and, per
deconv sub-position d, computes relu(x @ Wd[d] + bd) @ Wp + bp without
materializing the 256-channel upsampled activation. Output layout is
(4C, N, 196) — sub-position-major — so in-kernel stores are contiguous;
``mask_head_tail`` undoes the depth-to-space outside (20 MB, trivial).

Inference-only (the training path keeps the XLA deconv, whose backward
XLA already handles well); numerics match the unfused path: bf16 matmuls
with f32 accumulation, intermediate cast back to bf16 exactly where the
unfused path materializes bf16.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(x_ref, wd_ref, bd_ref, wp_ref, bp_ref, out_ref, *,
                 num_classes):
    t = x_ref.shape[0]
    hw = x_ref.shape[1] * x_ref.shape[2]
    cin = x_ref.shape[3]
    x = x_ref[:].reshape(t * hw, cin)
    bd = bd_ref[0].astype(jnp.float32)
    bp = bp_ref[0].astype(jnp.float32)
    for d in range(4):
        z = jnp.dot(x, wd_ref[d], preferred_element_type=jnp.float32)
        z = jnp.maximum(z + bd[None, :], 0.0).astype(x.dtype)
        o = jnp.dot(z, wp_ref[:], preferred_element_type=jnp.float32)
        o = (o + bp[None, :]).reshape(t, hw, num_classes)
        out_ref[pl.ds(d * num_classes, num_classes)] = \
            o.transpose(2, 0, 1).astype(out_ref.dtype)


def mask_head_tail(x, deconv_kernel, deconv_bias, pred_kernel, pred_bias,
                   *, block=16, interpret=False):
    """relu(conv_transpose_2x2_s2(x)) -> 1x1 conv, fused in VMEM.

    x: (N, P, P, Cin) bf16/f32; deconv_kernel: (2, 2, Cin, Cmid) with
    Cmid == Cin; deconv_bias: (Cmid,); pred_kernel: (1, 1, Cmid, C) or
    (Cmid, C); pred_bias: (C,).
    Returns (N, 2P, 2P, C) float32 logits, equal to
    lax.conv_transpose(..., 'SAME') + bias -> relu -> 1x1 conv + bias.
    """
    n, p, _, cin = x.shape
    cmid = deconv_kernel.shape[-1]
    wp = pred_kernel.reshape(cmid, -1)
    c = wp.shape[-1]

    # lax.conv_transpose applies the spatially FLIPPED kernel:
    # out[2i+di, 2j+dj] = x[i, j] @ K[1-di, 1-dj] (probed numerically).
    wd = deconv_kernel[::-1, ::-1].reshape(4, cin, cmid).astype(x.dtype)
    wp = wp.astype(x.dtype)
    bd = deconv_bias.reshape(1, cmid).astype(jnp.float32)
    bp = pred_bias.reshape(1, c).astype(jnp.float32)

    grid = (pl.cdiv(n, block),)
    out = pl.pallas_call(
        partial(_tail_kernel, num_classes=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, p, p, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cin, cmid), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * c, block, p * p), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * c, n, p * p), jnp.float32),
        interpret=interpret,
    )(x, wd, bd, wp, bp)

    # depth-to-space: (4C, N, P*P) -> (N, 2P, 2P, C);
    # channel index was d*C + cc with d = di*2 + dj.
    y = out.reshape(2, 2, c, n, p, p)           # (di, dj, cc, n, i, j)
    y = y.transpose(3, 4, 0, 5, 1, 2)           # (n, i, di, j, dj, cc)
    return y.reshape(n, 2 * p, 2 * p, c)
