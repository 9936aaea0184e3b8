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
import jax
import jax.numpy as jnp

from .layers import Conv, make_norm, max_pool_3x3_s2

BLOCKS_PER_STAGE = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _s2d_stem_conv(x, kernel):
    """7x7/s2/p3 conv computed as 4x4/s1 on a 2x2 space-to-depth input.

    Exact rewrite (same arithmetic, reassociated): with input rows r = 2o+d
    for taps d in [-3, 3], block index (2o+d)//2 = o + floor(d/2) and phase
    (2o+d) mod 2 — so a front-zero-padded 8x8 kernel regrouped into
    (4, 4, 2*2*C) slides stride-1 over the (H/2, W/2, 4C) s2d image with
    padding (2, 1). The 7x7 stem at C_in=3 runs at ~7% MFU on the MXU
    (3 channels waste 125/128 lanes); the s2d form measured ~4x faster on
    v5e. Parameters stay in the canonical (7, 7, C, F) layout for
    checkpoint parity; the regrouping is traced per forward (constant
    cost, fused by XLA).
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = k8.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 4 * c, f)
    return jax.lax.conv_general_dilated(
        xs, k4.astype(xs.dtype), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    norm_type: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        out = Conv(self.bottleneck_channels, kernel=1, stride=s1, padding=0,
                   use_bias=False, norm=True, norm_type=self.norm_type,
                   activation=nn.relu,
                   dtype=self.dtype, name="conv1")(x)
        out = Conv(self.bottleneck_channels, kernel=3, stride=s3, padding=1,
                   use_bias=False, norm=True, norm_type=self.norm_type,
                   activation=nn.relu,
                   dtype=self.dtype, name="conv2")(out)
        out = Conv(self.out_channels, kernel=1, stride=1, padding=0,
                   use_bias=False, norm=True, norm_type=self.norm_type,
                   norm_init_scale=0.0,
                   dtype=self.dtype, name="conv3")(out)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            x = Conv(self.out_channels, kernel=1, stride=self.stride,
                     padding=0, use_bias=False, norm=True,
                     norm_type=self.norm_type, dtype=self.dtype,
                     name="shortcut")(x)
        return nn.relu(out + x)


class _ConvKernel(nn.Module):
    """Bare conv kernel param (mirrors nn.Conv's name/init/layout)."""
    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          tuple(self.shape), jnp.float32)


class StemConv7(nn.Module):
    """7x7/s2/p3 + FrozenBN + relu, optionally via the s2d rewrite.

    Param tree matches Conv(kernel=7, ..., name='conv1') — conv/kernel in
    (7, 7, C, F) plus norm/{scale,bias} — so checkpoints and the d2-pkl
    converter are unaffected by the compute rewrite.

    ``s2d`` default OFF: the rewrite is exact and the 4x4/s1 conv alone
    profiles far better than the 7x7/s2 at C_in=3, but end-to-end on v5e
    it measured ~1.5% slower (92.5 -> 91.2 img/s on the flagship bench) —
    the s2d reshuffle of the full-resolution input is HBM-layout-hostile
    and XLA cannot fuse it into the preceding normalize.
    """
    features: int
    norm_type: str = "FrozenBN"
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = _ConvKernel((7, 7, c, self.features), name="conv")()
        xx = x.astype(self.dtype)
        if self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            y = _s2d_stem_conv(xx, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                xx, kernel.astype(self.dtype), window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = make_norm(self.norm_type, self.features,
                      dtype=self.dtype, name="norm")(y)
        return nn.relu(y)


class Stem(nn.Module):
    out_channels: int = 64
    norm_type: str = "FrozenBN"
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        x = StemConv7(self.out_channels, norm_type=self.norm_type,
                      dtype=self.dtype, s2d=self.s2d, name="conv1")(x)
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
    norm_type: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = Stem(self.stem_channels, norm_type=self.norm_type,
                 dtype=self.dtype, name="stem")(x)
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
                               norm_type=self.norm_type,
                               dtype=self.dtype, name=f"{name}.{b}")(x)
            if name in self.out_features:
                outputs[name] = x
            out_ch *= 2
            bott_ch *= 2
        return outputs
