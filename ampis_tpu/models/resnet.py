"""ResNet backbone (caffe-style R50/R101) in Flax, NHWC, bf16-friendly.

The reference model's backbone (detectron2 R50, config
'COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml', SURVEY.md §2b):
7x7/2 stem + 3x3/2 maxpool, bottleneck stages res2-res5 with FrozenBN and
stride-in-1x1 (MSRA/caffe convention — required for pretrained-weight
parity). Module/param names mirror the d2 layout (stem.conv1, res{n}.{i}
.conv{1,2,3}, shortcut) so the checkpoint converter is a pure relabeling.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv, FrozenBN, max_pool_3x3_s2

BLOCKS_PER_STAGE = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        out = Conv(self.bottleneck_channels, kernel=1, stride=s1, padding=0,
                   use_bias=False, norm=True, activation=nn.relu,
                   dtype=self.dtype, name="conv1")(x)
        out = Conv(self.bottleneck_channels, kernel=3, stride=s3, padding=1,
                   use_bias=False, norm=True, activation=nn.relu,
                   dtype=self.dtype, name="conv2")(out)
        out = Conv(self.out_channels, kernel=1, stride=1, padding=0,
                   use_bias=False, norm=True, norm_init_scale=0.0,
                   dtype=self.dtype, name="conv3")(out)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = Conv(self.out_channels, kernel=1, stride=self.stride,
                     padding=0, use_bias=False, norm=True, dtype=self.dtype,
                     name="shortcut")(x)
        return nn.relu(out + x)


class Stem(nn.Module):
    out_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.out_channels, kernel=7, stride=2, padding=3,
                 use_bias=False, norm=True, activation=nn.relu,
                 dtype=self.dtype, name="conv1")(x)
        return max_pool_3x3_s2(x)


class ResNet(nn.Module):
    """Returns {'res2': ..., 'res5': ...} feature dict, NHWC.

    freeze_at semantics match d2 (cfg.MODEL.BACKBONE.FREEZE_AT=2 freezes
    stem + res2); freezing is applied by the optimizer mask in the trainer,
    not here — the forward pass is identical.
    """
    depth: int = 50
    stem_channels: int = 64
    res2_out_channels: int = 256
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    stride_in_1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = Stem(self.stem_channels, dtype=self.dtype, name="stem")(x)
        outputs = {}
        blocks = BLOCKS_PER_STAGE[self.depth]
        out_ch = self.res2_out_channels
        bott_ch = out_ch // 4
        for stage_idx, n_blocks in enumerate(blocks):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(out_ch, bott_ch,
                               stride=stride if b == 0 else 1,
                               stride_in_1x1=self.stride_in_1x1,
                               dtype=self.dtype, name=f"{name}.{b}")(x)
            if name in self.out_features:
                outputs[name] = x
            out_ch *= 2
            bott_ch *= 2
        return outputs
