"""Microbenchmark: mask-head conv at bench shapes, bf16 vs int8 variants.

Answers (on the real chip) whether int8 3x3 convs actually run at the
v5e's 2x int8 MXU rate at the flagship mask-head shape, and how much the
dynamic-quantization overhead (per-tensor amax + round/clip passes)
costs, separating the two effects the end-to-end bench conflates.

Shapes: the flagship bench mask head = (BATCH*DETS, 14, 14, 256) x four
3x3/s1 convs, BATCH=32, DETS=400 -> N=12800.

Usage: python tools/microbench_int8.py
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


def conv_bf16(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y + b, 0)


def conv_int8_pre(xq, wq, dequant, b):
    """int8 in, int8 out with static (baked) scales."""
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * dequant + b, 0.0)
    # requantize for the next layer with a static scale (baked constant)
    return jnp.clip(jnp.round(y * (127.0 / 6.0)), -127, 127).astype(jnp.int8)


def conv_int8_dyn(x, w, b):
    from ampis_tpu.ops.quant import conv2d_int8
    return conv2d_int8(x, w, b, relu=True)


def timed(fn, *args, tag=""):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0, 0, :1])  # sync
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0, 0, :1])
    dt = (time.time() - t0) / REPS * 1e3
    flops = 2 * N * P * P * 9 * C * C * 4  # 4 chained convs
    print(f"{tag:28s} {dt:8.2f} ms/call   "
          f"{flops / dt / 1e9:8.1f} TFLOP(2xint8=394.7 peak)")
    return dt


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(N, P, P, C), jnp.bfloat16)
    ws = [jnp.asarray(rs.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
          for _ in range(4)]
    bs = [jnp.asarray(rs.randn(C) * 0.1, jnp.bfloat16) for _ in range(4)]

    def chain_bf16(x, ws, bs):
        for w, b in zip(ws, bs):
            x = conv_bf16(x, w, b)
        return x

    xq = jnp.asarray(rs.randint(-127, 128, (N, P, P, C)), jnp.int8)
    wqs = [jnp.asarray(rs.randint(-127, 128, (3, 3, C, C)), jnp.int8)
           for _ in range(4)]
    dqs = [jnp.asarray(rs.rand(C) * 1e-3, jnp.float32) for _ in range(4)]
    bfs = [jnp.asarray(rs.randn(C) * 0.1, jnp.float32) for _ in range(4)]

    def chain_int8_static(xq, wqs, dqs, bfs):
        for wq, dq, b in zip(wqs, dqs, bfs):
            xq = conv_int8_pre(xq, wq, dq, b)
        return xq

    def chain_int8_dyn(x, ws, bs):
        for w, b in zip(ws, bs):
            x = conv_int8_dyn(x, w, b)
        return x

    timed(chain_bf16, x, ws, bs, tag="bf16 direct (baseline)")
    timed(chain_int8_static, xq, wqs, dqs, bfs, tag="int8 static (pre-quant)")
    timed(chain_int8_dyn, x, ws, bs, tag="int8 dynamic (ops.quant)")


if __name__ == "__main__":
    main()
