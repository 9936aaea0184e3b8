"""Feature Pyramid Network on ResNet features, NHWC.

Reference model dependency (SURVEY.md §2b): lateral 1x1 convs on res2-res5,
top-down 2x nearest upsampling with sum fusion, 3x3 output convs, and P6
from a stride-2 subsample of P5 (detectron2 LastLevelMaxPool = maxpool k1
s2). Output channels 256.

``int8`` (inference-only, mirrors models.resnet Bottleneck): "calib"
records per-tensor activation scales into the "quant" collection;
"static" runs the lateral and output convs as int8. When the backbone
also runs static int8, the res2-res5 inputs arrive as (int8, scale)
pairs and the laterals consume them directly — the full-resolution
backbone outputs never materialize in bf16.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv, ConvInt8, max_pool_1x1_s2


def upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    top_block: bool = True  # add p6 via stride-2 subsample of p5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: dict, int8=False):
        names = list(self.in_features)  # e.g. res2..res5

        if int8:
            zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
            lat_s = [self.variable("quant", f"lat_in_scale{i + 2}", zero)
                     for i in range(len(names))]
            out_s = [self.variable("quant", f"out_in_scale{i + 2}", zero)
                     for i in range(len(names))]

        if int8 == "static":
            from ..ops.quant import quantize_static
            laterals = {}
            for i, name in enumerate(names):
                f = features[name]
                if isinstance(f, tuple):      # chained from int8 backbone
                    xq, sx = f
                else:
                    sx = lat_s[i].value
                    xq = quantize_static(f, sx)
                laterals[name] = ConvInt8(
                    self.out_channels, kernel=1,
                    name=f"fpn_lateral{i + 2}")(xq, sx,
                                                out_dtype=jnp.float32)
            outs = {}
            prev = None
            for i in reversed(range(len(names))):
                x = laterals[names[i]]
                if prev is not None:
                    x = x + upsample_nearest_2x(prev)
                prev = x
                outs[f"p{i + 2}"] = ConvInt8(
                    self.out_channels, kernel=3, padding=1,
                    name=f"fpn_output{i + 2}")(
                        quantize_static(x, out_s[i].value),
                        out_s[i].value, out_dtype=self.dtype)
            if self.top_block:
                outs["p6"] = max_pool_1x1_s2(outs["p5"])
            return outs

        # float path (also the "calib" recording pass)
        laterals = {}
        for i, name in enumerate(names):
            f = features[name]
            if int8 == "calib":
                amax = jnp.max(jnp.abs(f.astype(jnp.float32)))
                lat_s[i].value = jnp.maximum(amax, 1e-12) / 127.0
            laterals[name] = Conv(self.out_channels, kernel=1, padding=0,
                                  use_bias=True, dtype=self.dtype,
                                  name=f"fpn_lateral{i + 2}")(f)
        outs = {}
        prev = None
        for i in reversed(range(len(names))):
            name = names[i]
            x = laterals[name]
            if prev is not None:
                x = x + upsample_nearest_2x(prev)
            prev = x
            if int8 == "calib":
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                out_s[i].value = jnp.maximum(amax, 1e-12) / 127.0
            outs[f"p{i + 2}"] = Conv(self.out_channels, kernel=3, padding=1,
                                     use_bias=True, dtype=self.dtype,
                                     name=f"fpn_output{i + 2}")(x)
        if self.top_block:
            outs["p6"] = max_pool_1x1_s2(outs["p5"])
        return outs
