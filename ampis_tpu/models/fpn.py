"""Feature Pyramid Network on ResNet features, NHWC.

Reference model dependency (SURVEY.md §2b): lateral 1x1 convs on res2-res5,
top-down 2x nearest upsampling with sum fusion, 3x3 output convs, and P6
from a stride-2 subsample of P5 (detectron2 LastLevelMaxPool = maxpool k1
s2). Output channels 256.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv, max_pool_1x1_s2


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
    def __call__(self, features: dict):
        # build top-down, highest level first
        names = list(self.in_features)  # e.g. res2..res5
        laterals = {}
        for i, name in enumerate(names):
            laterals[name] = Conv(self.out_channels, kernel=1, padding=0,
                                  use_bias=True, dtype=self.dtype,
                                  name=f"fpn_lateral{i + 2}")(features[name])
        outs = {}
        prev = None
        for i in reversed(range(len(names))):
            name = names[i]
            x = laterals[name]
            if prev is not None:
                x = x + upsample_nearest_2x(prev)
            prev = x
            outs[f"p{i + 2}"] = Conv(self.out_channels, kernel=3, padding=1,
                                     use_bias=True, dtype=self.dtype,
                                     name=f"fpn_output{i + 2}")(x)
        if self.top_block:
            outs["p6"] = max_pool_1x1_s2(outs["p5"])
        return outs
