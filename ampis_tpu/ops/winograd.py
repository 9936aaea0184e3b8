"""Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

The mask head's 3x3/s1 convs run at ~99% MXU utilization in direct form
(XLA), so the only way to go faster on the same hardware is to do fewer
multiplies: Winograd F(2x2, 3x3) computes each 2x2 output tile from a 4x4
input tile with 16 multiplies instead of 36 (2.25x fewer MXU FLOPs).

Why a kernel and not XLA einsums: the transform-domain tensors V and M are
4x the activation size; materializing them in HBM costs more bandwidth
than the MXU time saved (measured ~20 GB round-trip for the mask-head
shapes — slower than direct conv). The kernel keeps the whole pipeline —
input transform, 16 per-tile-position matmuls, inverse transform, bias +
relu — in VMEM per grid step.

Math (Lavin & Gray, arXiv:1509.09308): with g the 3x3 filter and d a 4x4
input tile, Y = A^T [ (G g G^T) .* (B^T d B) ] A where

    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]   (adds only)
    G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]       (exact in bf16)
    A^T = [[1,1,1,0],[0,1,-1,-1]]                         (adds only)

Per tile position (xi, nu) the channel contraction is a dense matmul
(tiles, C) @ (C, K) with f32 accumulation; the 16 M tensors are combined
into the four output phases with +-1 coefficients in f32, so accumulation
error is comparable to the direct conv (which also f32-accumulates).

Scope: NHWC, stride 1, SAME (pad 1) zero padding, even H and W, C and K
multiples of 128. Inference-only (no VJP) — the training path keeps the
direct conv. Used by models.roi_heads.MaskHead for its four 14x14 convs
(reference parity target: detectron2 mask head, SURVEY.md §2b).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# G for the weight transform U = G g G^T (computed in XLA, f32, once per
# call — weights are tiny next to activations).
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]], np.float32)


def transform_weights(w):
    """(3, 3, C, K) HWIO -> (16, C, K) transform-domain filter U."""
    u = jnp.einsum("xa,abck,yb->xyck", _G, w.astype(jnp.float32), _G)
    return u.reshape(16, *w.shape[2:])


def _bt_1d(d0, d1, d2, d3):
    """B^T applied along one axis: 4 inputs -> 4 outputs, adds only."""
    return d0 - d2, d1 + d2, d2 - d1, d1 - d3


def _winograd_kernel(x_ref, u_ref, b_ref, out_ref, *, G_ROI, H, W, C, K,
                     relu):
    th, tw = H // 2, W // 2
    nt = G_ROI * th * tw
    x = x_ref[...]
    # zero-pad H/W by 1 (SAME for 3x3); H+2 == 2*(th+1) stays even
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # phase decomposition: row 2i+a == (block i + a//2, phase a%2), so all
    # 16 tile slices below are static contiguous slices — no strided loads
    xr = xp.reshape(G_ROI, th + 1, 2, tw + 1, 2, C)

    def tile(a, b):
        return xr[:, a // 2:a // 2 + th, a % 2,
                  b // 2:b // 2 + tw, b % 2, :]

    y_acc = [[None, None], [None, None]]
    f32 = jnp.float32
    for nu in range(4):
        # recompute the per-a transforms for this nu instead of holding
        # all 16 t[a][nu] live — 4x more VPU adds, several MB less VMEM
        t_nu = [_bt_1d(*(tile(a, b) for b in range(4)))[nu]
                for a in range(4)]
        v = _bt_1d(*t_nu)
        for xi in range(4):
            m = jnp.dot(v[xi].reshape(nt, C), u_ref[xi * 4 + nu],
                        preferred_element_type=f32)
            # inverse transform A^T . A: output phase (p, q) coefficient
            # for M[xi, nu] is AT[p, xi] * AT[q, nu], AT rows
            # (1, 1, 1, 0) and (0, 1, -1, -1)
            cx = (1.0, 1.0, 1.0, 0.0)[xi], (0.0, 1.0, -1.0, -1.0)[xi]
            cn = (1.0, 1.0, 1.0, 0.0)[nu], (0.0, 1.0, -1.0, -1.0)[nu]
            for p in range(2):
                for q in range(2):
                    coef = cx[p] * cn[q]
                    if coef == 0.0:
                        continue
                    term = m if coef == 1.0 else -m
                    y_acc[p][q] = term if y_acc[p][q] is None \
                        else y_acc[p][q] + term
    bias = b_ref[...].astype(f32)
    out = []
    for p in range(2):
        row = []
        for q in range(2):
            y = y_acc[p][q] + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            row.append(y.reshape(G_ROI, th, tw, K))
        # interleave q phases -> (G, th, W, K)
        out.append(jnp.stack(row, axis=3).reshape(G_ROI, th, W, K))
    # interleave p phases -> (G, H, W, K)
    y = jnp.stack(out, axis=2).reshape(G_ROI, H, W, K)
    out_ref[...] = y.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("relu", "group", "interpret"))
def conv3x3_winograd(x, w, b, *, relu=True, group=8, interpret=False):
    """3x3/s1 SAME conv + bias (+ relu) via Winograd F(2x2, 3x3).

    x: (N, H, W, C) with H, W even; w: (3, 3, C, K) HWIO; b: (K,).
    Matches jax.lax.conv_general_dilated(..., padding=((1,1),(1,1))) + bias
    (+ relu) to bf16 accuracy. N is padded to a multiple of ``group``.
    """
    n, h, w_sp, c = x.shape
    k = w.shape[-1]
    assert h % 2 == 0 and w_sp % 2 == 0, "Winograd F(2,3) needs even H, W"
    u = transform_weights(w).astype(x.dtype)
    pad = (-n) % group
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    np_ = x.shape[0]
    kernel = partial(_winograd_kernel, G_ROI=group, H=h, W=w_sp, C=c, K=k,
                     relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=(np_ // group,),
        in_specs=[
            pl.BlockSpec((group, h, w_sp, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((16, c, k), lambda i: (0, 0, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((group, h, w_sp, k), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, h, w_sp, k), x.dtype),
        interpret=interpret,
    )(x, u, b.astype(x.dtype))
    return out[:n] if pad else out
