"""Dynamic int8 quantized convolution for the inference hot path.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 FLOP rate
(394.7 TOPS vs 197.4 TFLOPS), and int8 activations halve HBM traffic.
The mask head's four 3x3/s1 convs run at ~99% MXU utilization in bf16
(~60 ms/batch-32 on the flagship bench) — precision is the one remaining
lever at that utilization.

Scheme (standard symmetric quantization):

* activations: per-tensor scale s_x = max|x| / 127 — either dynamic
  (computed on the fly, one amax reduction per layer) or static
  (calibrated once, stored in the model's "quant" variable collection);
* weights: per-output-channel scales s_w[c] = max|w[..., c]| / 127,
  computed at trace time from the (frozen, inference) weights;
* y = conv(x_q, w_q) accumulated in int32, dequantized by s_x * s_w[c],
  then bias + relu in f32 — identical epilogue to the bf16 path.

Measured on v5e (tools/microbench_int8.py, tools/microbench_deconv.py,
flagship bench shapes): the static path's conv chain runs 1.87x faster
than bf16 (355 vs 190 TFLOP-equivalent) because the quantize/requantize
steps fuse into the conv epilogues; the dynamic path's amax reductions
and f32 deconv phases lose the whole win end-to-end (96.8 vs 112.6
img/s). Production mode is "static" + deconv_predictor_int8 (121.7 vs
113.6 img/s end-to-end, +7%). See docs/performance.md.

Error: |y_err| <= (|x|_max / 254) * sum|w| per tap in the worst case;
mask AP impact on a trained model is measured before enabling by
default (docs/performance.md). Inference-only; training keeps bf16/f32.

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


def quantize_static(x, scale):
    """x float -> int8 with a fixed (calibrated) scale.

    Pure elementwise — XLA fuses it into the producing op's epilogue, so
    unlike :func:`quantize_tensor` there is no extra amax reduction pass
    over the activation and the HBM write is 1 byte/element.
    """
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return xq.astype(jnp.int8)


def conv2d_int8(x, w, b, *, strides=(1, 1), padding=((1, 1), (1, 1)),
                relu=True, out_dtype=None, sx=None, out_scale=None):
    """NHWC conv with int8 inputs and int32 MXU accumulation.

    x: (N, H, W, C) float (or int8 if ``sx`` is given and x is already
    quantized); w: (kh, kw, C, K) float (quantized per output channel at
    trace time); b: (K,) float. Matches the float conv up to quantization
    error (~0.5% relative for well-scaled activations).

    sx: optional static activation scale (scalar, from calibration) —
    skips the dynamic amax pass. out_scale: if given, the output is
    requantized to int8 with that scale (fused into the epilogue) for
    chaining into another int8 conv; otherwise float ``out_dtype``.
    """
    out_dtype = out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8
                              else x.dtype)
    if x.dtype == jnp.int8:
        assert sx is not None, "int8 input requires its scale"
        xq = x
    elif sx is None:
        xq, sx = quantize_tensor(x)
    else:
        xq = quantize_static(x, sx)
    wq, sw = quantize_weights_per_channel(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw) + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_scale is not None:
        return quantize_static(y, out_scale)
    return y.astype(out_dtype)


def conv_transpose2x2_int8(x, w, b, *, relu=True, out_dtype=None, sx=None):
    """2x2/s2 transposed conv (deconv) with dynamic int8 inputs.

    Stride == kernel size means no overlap: output phase (dy, dx) is
    x @ w[1-dy, 1-dx] (lax.conv_transpose flips the kernel spatially) —
    four int8 matmuls, interleaved back to (N, 2H, 2W, K). Matches
    lax.conv_transpose(..., 'SAME') + bias (+ relu) up to quantization
    error.
    """
    out_dtype = out_dtype or (jnp.bfloat16 if x.dtype == jnp.int8
                              else x.dtype)
    n, h, wd, c = x.shape
    k = w.shape[-1]
    if x.dtype == jnp.int8:
        assert sx is not None, "int8 input requires its scale"
        xq = x
    elif sx is None:
        xq, sx = quantize_tensor(x)
    else:
        xq = quantize_static(x, sx)
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


def deconv_predictor_int8(x, kd, bd, kp, bp, *, sx=None):
    """2x2/s2 deconv + relu + 1x1 predictor, predictor folded per phase.

    The production static-int8 mask-head tail: each of the four
    non-overlapping deconv output phases is an int8 matmul whose f32
    epilogue (dequant + bias + relu) feeds the (K, num_classes) predictor
    *inside the same fusion* — the (N, 2H, 2W, K) activation never
    reaches HBM (~5 GB/batch-32 at the flagship shape; the phase-stacked
    variant that materializes it measured 61 ms vs 12 ms for this one on
    v5e — tools/microbench_deconv.py).

    x: (N, H, W, C) float or int8 (with ``sx``); kd: (2, 2, C, K);
    bd: (K,); kp: (1, 1, K, num_classes) or (K, num_classes); bp:
    (num_classes,). Returns f32 logits (N, 2H, 2W, num_classes).
    """
    n, h, wd, c = x.shape
    if x.dtype == jnp.int8:
        assert sx is not None, "int8 input requires its scale"
        xq = x
    elif sx is None:
        xq, sx = quantize_tensor(x)
    else:
        xq = quantize_static(x, sx)
    wq, sw = quantize_weights_per_channel(kd)       # (2, 2, C, K)
    kpf = kp.reshape(kd.shape[-1], -1).astype(jnp.float32)
    bpf = bp.astype(jnp.float32)
    xm = xq.reshape(n * h * wd, c)
    phases = []
    for dy in range(2):
        row = []
        for dx in range(2):
            acc = jax.lax.dot_general(
                xm, wq[1 - dy, 1 - dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(
                acc.astype(jnp.float32) * (sx * sw)
                + bd.astype(jnp.float32), 0.0)
            row.append((jnp.dot(y, kpf) + bpf).reshape(n, h, wd, -1))
        phases.append(jnp.stack(row, axis=3))       # (N, H, W, 2, cls)
    z = jnp.stack(phases, axis=2)                   # (N, H, 2, W, 2, cls)
    return z.reshape(n, 2 * h, 2 * wd, -1)
