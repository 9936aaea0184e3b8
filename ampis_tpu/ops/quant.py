"""Dynamic int8 quantized convolution for the inference hot path.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 FLOP rate
(394.7 TOPS vs 197.4 TFLOPS), and int8 activations halve HBM traffic.
The mask head's four 3x3/s1 convs run at ~99% MXU utilization in bf16
(~60 ms/batch-32 on the flagship bench) — precision is the one remaining
lever at that utilization.

Scheme (standard symmetric dynamic quantization):

* activations: one per-tensor scale s_x = max|x| / 127 computed on the
  fly (a single fused reduction), x_q = round(x / s_x) in [-127, 127];
* weights: per-output-channel scales s_w[c] = max|w[..., c]| / 127,
  computed at trace time from the (frozen, inference) weights;
* y = conv(x_q, w_q) accumulated in int32, dequantized by s_x * s_w[c],
  then bias + relu in f32 — identical epilogue to the bf16 path.

Error: |y_err| <= (|x|_max / 254) * sum|w| per tap in the worst case; in
practice sigmoid(mask logits) thresholded at 0.5 moves a negligible
fraction of mask pixels (measured on the trained powder model — see
docs/performance.md). Inference-only; training keeps bf16/f32 convs.

Reference parity note: detectron2's mask head is f32/f16 — this path is
a deliberate, flagged deviation (MaskRCNN.int8_mask_head, default off)
whose AP impact is measured rather than assumed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_tensor(x):
    """x (any float) -> (x_q int8, scale f32 scalar). Symmetric, dynamic."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8), scale


def quantize_weights_per_channel(w):
    """w (..., K) -> (w_q int8, scales (K,) f32). Per-output-channel."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)))
    scales = jnp.maximum(amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w32 / scales), -127, 127).astype(jnp.int8)
    return wq, scales


def conv2d_int8(x, w, b, *, strides=(1, 1), padding=((1, 1), (1, 1)),
                relu=True, out_dtype=None):
    """NHWC conv with dynamic int8 inputs and int32 MXU accumulation.

    x: (N, H, W, C) float; w: (kh, kw, C, K) float (quantized per output
    channel at trace time); b: (K,) float. Matches the float conv up to
    quantization error (~0.5% relative for well-scaled activations).
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_tensor(x)
    wq, sw = quantize_weights_per_channel(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw) + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def conv_transpose2x2_int8(x, w, b, *, relu=True, out_dtype=None):
    """2x2/s2 transposed conv (deconv) with dynamic int8 inputs.

    Stride == kernel size means no overlap: output phase (dy, dx) is
    x @ w[1-dy, 1-dx] (lax.conv_transpose flips the kernel spatially) —
    four int8 matmuls, interleaved back to (N, 2H, 2W, K). Matches
    lax.conv_transpose(..., 'SAME') + bias (+ relu) up to quantization
    error.
    """
    out_dtype = out_dtype or x.dtype
    n, h, wd, c = x.shape
    k = w.shape[-1]
    xq, sx = quantize_tensor(x)
    wq, sw = quantize_weights_per_channel(w)   # (2, 2, C, K)
    xm = xq.reshape(n * h * wd, c)
    phases = []
    for dy in range(2):
        row = []
        for dx in range(2):
            acc = jax.lax.dot_general(
                xm, wq[1 - dy, 1 - dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (sx * sw) \
                + b.astype(jnp.float32)
            if relu:
                y = jnp.maximum(y, 0.0)
            row.append(y.reshape(n, h, wd, k))
        phases.append(jnp.stack(row, axis=3))       # (N, H, W, 2, K)
    y = jnp.stack(phases, axis=2)                   # (N, H, 2, W, 2, K)
    return y.reshape(n, 2 * h, 2 * wd, k).astype(out_dtype)
