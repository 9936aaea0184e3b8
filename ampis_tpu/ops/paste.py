"""Device-side mask pasting (low-res soft mask -> full-res bitmask).

The production inference path never materializes full-res bitmasks on
device: the fused host C++ paste+RLE-encode (ampis_tpu.rle
.paste_masks_to_rle, csrc/rle.cpp) consumes the (N, 28, 28) soft masks
directly (the reference materialized N x H x W on GPU and then compressed,
reference data_utils.py:275). This JAX version exists for on-device
consumers (visual debugging, on-TPU mask IoU) and as the differentiable
counterpart.

Semantics match torch grid_sample(align_corners=False) with zero padding,
as used by detectron2's paste_masks_in_image.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("image_size", "threshold"))
def paste_masks(masks, boxes, image_size, threshold=0.5):
    """Paste (N, mh, mw) soft masks into XYXY boxes on an (h, w) canvas.

    Returns (N, h, w) bool (or float if threshold is None).
    """
    h, w = image_size
    n, mh, mw = masks.shape

    ys = jnp.arange(h, dtype=jnp.float32) + 0.5   # pixel centers
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    x0, y0, x1, y1 = [boxes[:, i] for i in range(4)]
    bw = jnp.maximum(x1 - x0, 1e-9)
    bh = jnp.maximum(y1 - y0, 1e-9)

    # normalized [-1, 1] coords within box -> mask grid coords
    gy = ((ys[None, :] - y0[:, None]) / bh[:, None] * 2.0 - 1.0)
    gx = ((xs[None, :] - x0[:, None]) / bw[:, None] * 2.0 - 1.0)
    fy = ((gy + 1.0) * mh - 1.0) / 2.0            # (N, h)
    fx = ((gx + 1.0) * mw - 1.0) / 2.0            # (N, w)

    def sample(mask_1d, f, size):
        low = jnp.floor(f).astype(jnp.int32)
        frac = f - low.astype(jnp.float32)
        v0_ok = (low >= 0) & (low < size)
        v1_ok = (low + 1 >= 0) & (low + 1 < size)
        i0 = jnp.clip(low, 0, size - 1)
        i1 = jnp.clip(low + 1, 0, size - 1)
        return i0, i1, frac, v0_ok, v1_ok

    y0i, y1i, wy, y0ok, y1ok = sample(None, fy, mh)
    x0i, x1i, wx, x0ok, x1ok = sample(None, fx, mw)

    def paste_one(mask, y0i, y1i, wy, y0ok, y1ok, x0i, x1i, wx, x0ok, x1ok):
        # gather rows then cols
        r0 = mask[y0i] * y0ok[:, None]            # (h, mw)
        r1 = mask[y1i] * y1ok[:, None]
        row = r0 * (1 - wy)[:, None] + r1 * wy[:, None]
        c0 = row[:, x0i] * x0ok[None, :]          # (h, w)
        c1 = row[:, x1i] * x1ok[None, :]
        return c0 * (1 - wx)[None, :] + c1 * wx[None, :]

    out = jax.vmap(paste_one)(masks.astype(jnp.float32), y0i, y1i, wy, y0ok,
                              y1ok, x0i, x1i, wx, x0ok, x1ok)
    if threshold is None:
        return out
    return out > threshold
