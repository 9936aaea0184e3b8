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

from .layers import Conv, ConvBNInt8, make_norm, max_pool_3x3_s2

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
    """1x1 -> 3x3 -> 1x1 bottleneck with FrozenBN/GN.

    ``int8`` (inference-only, FrozenBN models): "calib" runs the float
    path and records per-tensor activation scales into the "quant"
    variable collection; "static" runs the whole block as chained int8
    convs with the norm folded into the quantized kernels
    (layers.ConvBNInt8) — the tensors crossing HBM between convs and
    between blocks are int8 (half the bandwidth of bf16; the backbone is
    bandwidth-bound on v5e). In static mode __call__ takes and returns
    an (int8 tensor, f32 scale) pair (a bare float input is quantized
    with the block's calibrated in_scale).
    """
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    norm_type: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, int8=False):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        has_sc = ((x[0] if isinstance(x, tuple) else x).shape[-1]
                  != self.out_channels or self.stride != 1)

        if int8:
            zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
            in_s = self.variable("quant", "in_scale", zero)
            c1_s = self.variable("quant", "c1_scale", zero)
            c2_s = self.variable("quant", "c2_scale", zero)
            out_s = self.variable("quant", "out_scale", zero)

        if int8 == "static":
            from ..ops.quant import quantize_static
            if isinstance(x, tuple):
                xq, sx = x
            else:
                xq, sx = quantize_static(x, in_s.value), in_s.value
            out = ConvBNInt8(self.bottleneck_channels, kernel=1, stride=s1,
                             name="conv1")(xq, sx, relu=True,
                                           out_scale=c1_s.value)
            out = ConvBNInt8(self.bottleneck_channels, kernel=3, stride=s3,
                             padding=1, name="conv2")(
                                 out, c1_s.value, relu=True,
                                 out_scale=c2_s.value)
            out = ConvBNInt8(self.out_channels, kernel=1,
                             norm_init_scale=0.0, name="conv3")(
                                 out, c2_s.value, relu=False)
            if has_sc:
                sc = ConvBNInt8(self.out_channels, kernel=1,
                                stride=self.stride, name="shortcut")(
                                    xq, sx, relu=False)
            else:
                sc = xq.astype(jnp.float32) * sx
            y = jnp.maximum(out + sc, 0.0)
            return quantize_static(y, out_s.value), out_s.value

        if int8 == "calib":
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            in_s.value = jnp.maximum(amax, 1e-12) / 127.0

        out = Conv(self.bottleneck_channels, kernel=1, stride=s1, padding=0,
                   use_bias=False, norm=True, norm_type=self.norm_type,
                   activation=nn.relu,
                   dtype=self.dtype, name="conv1")(x)
        if int8 == "calib":
            amax = jnp.max(jnp.abs(out.astype(jnp.float32)))
            c1_s.value = jnp.maximum(amax, 1e-12) / 127.0
        out = Conv(self.bottleneck_channels, kernel=3, stride=s3, padding=1,
                   use_bias=False, norm=True, norm_type=self.norm_type,
                   activation=nn.relu,
                   dtype=self.dtype, name="conv2")(out)
        if int8 == "calib":
            amax = jnp.max(jnp.abs(out.astype(jnp.float32)))
            c2_s.value = jnp.maximum(amax, 1e-12) / 127.0
        out = Conv(self.out_channels, kernel=1, stride=1, padding=0,
                   use_bias=False, norm=True, norm_type=self.norm_type,
                   norm_init_scale=0.0,
                   dtype=self.dtype, name="conv3")(out)
        if has_sc:
            x = Conv(self.out_channels, kernel=1, stride=self.stride,
                     padding=0, use_bias=False, norm=True,
                     norm_type=self.norm_type, dtype=self.dtype,
                     name="shortcut")(x)
        y = nn.relu(out + x)
        if int8 == "calib":
            amax = jnp.max(jnp.abs(y.astype(jnp.float32)))
            out_s.value = jnp.maximum(amax, 1e-12) / 127.0
        return y


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
    def __call__(self, x, int8=False, int8_outputs=False):
        """``int8``: False | "calib" | "static" — int8 inference for
        res2-res5 (see Bottleneck). Call-level (not a field) so the
        training path never sees it. The stem stays bf16 (C_in=3 —
        quantizing the raw image buys nothing and costs input
        precision). ``int8_outputs``: return (int8, scale) pairs for the
        out_features instead of dequantizing (for an int8 FPN)."""
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
                               dtype=self.dtype,
                               name=f"{name}.{b}")(x, int8=int8)
            if name in self.out_features:
                if isinstance(x, tuple) and not int8_outputs:
                    # static int8: dequantize for a float FPN
                    outputs[name] = (x[0].astype(jnp.float32)
                                     * x[1]).astype(self.dtype)
                else:
                    outputs[name] = x
            out_ch *= 2
            bott_ch *= 2
        return outputs
