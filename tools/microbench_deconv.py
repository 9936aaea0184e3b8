"""Microbenchmark: mask-head deconv (2x2/s2) variants at bench shapes.

The static-int8 mask head measured slower end-to-end than bf16 even
though the 4x3x3 conv chain alone is 1.87x faster — this isolates the
deconv + predictor tail to find where the win is lost.

Variants (N=12800, 14x14x256 in, 28x28 out, predictor 256->1):
  A. bf16 lax.conv_transpose + relu + 1x1 predictor  (baseline tail)
  B. int8 4-phase matmuls (ops.quant static) + bf16 predictor
  C. int8 4-phase matmuls with the 1x1 predictor folded INTO each
     phase — never materializes the (N, 28, 28, 256) activation.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from ampis_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

N, P, C = 12800, 14, 256
REPS = 20


def tail_bf16(x, kd, bd, kp, bp):
    y = jax.lax.conv_transpose(
        x, kd, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y + bd, 0)
    return (jnp.dot(y, kp) + bp).astype(jnp.float32)


def tail_int8_phases(xq, wq, sx, sw, bd, kp, bp):
    n, h, wd, c = xq.shape
    k = wq.shape[-1]
    xm = xq.reshape(n * h * wd, c)
    phases = []
    for dy in range(2):
        row = []
        for dx in range(2):
            acc = jax.lax.dot_general(
                xm, wq[1 - dy, 1 - dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(acc.astype(jnp.float32) * (sx * sw) + bd, 0.0)
            row.append(y.astype(jnp.bfloat16).reshape(n, h, wd, k))
        phases.append(jnp.stack(row, axis=3))
    y = jnp.stack(phases, axis=2).reshape(n, 2 * h, 2 * wd, k)
    return (jnp.dot(y, kp) + bp).astype(jnp.float32)


def tail_int8_fused_pred(xq, wq, sx, sw, bd, kp, bp):
    n, h, wd, c = xq.shape
    xm = xq.reshape(n * h * wd, c)
    kpf = kp.astype(jnp.float32)
    phases = []
    for dy in range(2):
        row = []
        for dx in range(2):
            acc = jax.lax.dot_general(
                xm, wq[1 - dy, 1 - dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = jnp.maximum(acc.astype(jnp.float32) * (sx * sw) + bd, 0.0)
            z = jnp.dot(y, kpf) + bp          # (n*h*w, num_classes)
            row.append(z.reshape(n, h, wd, -1))
        phases.append(jnp.stack(row, axis=3))
    z = jnp.stack(phases, axis=2)             # (n, h, 2, w, 2, cls)
    return z.reshape(n, 2 * h, 2 * wd, -1).astype(jnp.float32)


def timed(fn, *args, tag=""):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out[0, 0, 0, :1])
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    np.asarray(out[0, 0, 0, :1])
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{tag:36s} {dt:8.2f} ms/call")
    return dt


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(N, P, P, C), jnp.bfloat16)
    kd = jnp.asarray(rs.randn(2, 2, C, C) * 0.05, jnp.bfloat16)
    bd = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    kp = jnp.asarray(rs.randn(C, 1) * 0.05, jnp.bfloat16)
    bp = jnp.asarray(rs.randn(1) * 0.1, jnp.float32)

    xq = jnp.asarray(rs.randint(-127, 128, (N, P, P, C)), jnp.int8)
    wq = jnp.asarray(rs.randint(-127, 128, (2, 2, C, C)), jnp.int8)
    sx = jnp.float32(0.05)
    sw = jnp.asarray(rs.rand(C) * 1e-3, jnp.float32)

    timed(tail_bf16, x, kd, bd.astype(jnp.bfloat16), kp,
          bp.astype(jnp.bfloat16), tag="A bf16 conv_transpose tail")
    timed(tail_int8_phases, xq, wq, sx, sw, bd, kp, bp,
          tag="B int8 phases + bf16 predictor")
    timed(tail_int8_fused_pred, xq, wq, sx, sw, bd, kp, bp,
          tag="C int8 phases, predictor folded")


if __name__ == "__main__":
    main()
