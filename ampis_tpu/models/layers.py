"""Shared NN layers for the TPU Mask R-CNN.

NHWC layout throughout (TPU-native). Convolutions use explicit symmetric
padding to match the reference model's torch semantics (torch pads
symmetrically; XLA 'SAME' pads asymmetrically for stride > 1, which would
shift every downsampling feature map half a pixel and break checkpoint
parity).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import jax


class FrozenBN(nn.Module):
    """Frozen batch norm folded to a per-channel scale + bias.

    The reference backbone uses FrozenBatchNorm2d everywhere (detectron2
    R50 default, SURVEY.md §2b). The d2-pkl converter folds
    gamma/beta/mean/var into (scale, bias). From-scratch init uses
    ``init_scale``: residual blocks zero-init their last norm's scale (the
    standard zero-gamma recipe) so an untrained backbone doesn't amplify
    activations exponentially with depth.
    """
    features: int
    init_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale",
                           nn.initializers.constant(self.init_scale),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class GroupNorm(nn.Module):
    """32-group GroupNorm with FrozenBN-compatible param tree.

    For from-scratch training (cfg.MODEL.RESNETS.NORM = "GN"): FrozenBN is
    a bare affine at random init, which is the classic from-scratch
    handicap — the reference never hits it because its recipe always
    starts from COCO weights whose folded BN statistics normalize each
    stage ("Rethinking ImageNet Pre-training", He et al. 2019, uses GN/
    SyncBN for from-scratch detection). Parameters are the same
    {scale, bias} of shape (C,) under the same "norm" module name, so
    checkpoint structure is identical to FrozenBN and the trainer's
    freeze logic can key on norm type alone. Statistics in f32.
    """
    features: int
    groups: int = 32
    init_scale: float = 1.0
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale",
                           nn.initializers.constant(self.init_scale),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        g = min(self.groups, self.features)
        shape = x.shape
        xf = x.astype(jnp.float32).reshape(
            shape[0], -1, g, self.features // g)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(shape)
        return (xn * scale + bias).astype(self.dtype)


def make_norm(norm_type: str, features: int, init_scale: float = 1.0,
              dtype=jnp.float32, name: str = "norm"):
    """Norm layer by detectron2 config name: "FrozenBN" (default) | "GN"."""
    if norm_type.lower() in ("frozenbn", "bn", ""):
        return FrozenBN(features, init_scale=init_scale, dtype=dtype,
                        name=name)
    if norm_type.lower() == "gn":
        return GroupNorm(features, init_scale=init_scale, dtype=dtype,
                         name=name)
    raise ValueError(f"unsupported norm type: {norm_type!r}")


class Conv(nn.Module):
    """Conv2D with torch-style symmetric padding, NHWC, optional norm+relu."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None
    use_bias: bool = True
    norm: bool = False
    norm_type: str = "FrozenBN"
    norm_init_scale: float = 1.0
    activation: Optional[Callable] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        if self.norm:
            x = make_norm(self.norm_type, self.features,
                          init_scale=self.norm_init_scale,
                          dtype=self.dtype, name="norm")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class _KernelParam(nn.Module):
    """Bare conv kernel param matching nn.Conv's name/init/layout."""
    shape: Any

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          tuple(self.shape), jnp.float32)


class _NormParams(nn.Module):
    """Bare FrozenBN {scale, bias} params (same names/inits as FrozenBN)."""
    features: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self):
        scale = self.param("scale",
                           nn.initializers.constant(self.init_scale),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class _ConvBiasParams(nn.Module):
    """Bare conv {kernel, bias} params matching nn.Conv's names/inits."""
    shape: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       tuple(self.shape), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                       jnp.float32)
        return k, b


class ConvInt8(nn.Module):
    """conv + bias computed as one int8 conv (no norm).

    Param tree is identical to ``Conv(..., use_bias=True, norm=False)``
    (conv/{kernel, bias} under this module's name). Inference-only.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, xq, sx, *, relu=False, out_scale=None,
                 out_dtype=jnp.float32):
        from ..ops.quant import conv2d_int8
        cin = xq.shape[-1]
        k, b = _ConvBiasParams(
            (self.kernel, self.kernel, cin, self.features), name="conv")()
        pad = ((self.padding, self.padding),) * 2
        return conv2d_int8(xq, k, b, strides=(self.stride, self.stride),
                           padding=pad, relu=relu, sx=sx,
                           out_scale=out_scale, out_dtype=out_dtype)


class ConvBNInt8(nn.Module):
    """conv + FrozenBN computed as one int8 conv with the norm folded in.

    Param tree is IDENTICAL to ``Conv(..., use_bias=False, norm=True)``
    (conv/kernel + norm/{scale, bias} under this module's name), so a
    checkpoint trained on the float path loads unchanged. At trace time
    the FrozenBN affine folds into the conv: conv(x)*s + b == x ⊛ (w*s)
    + b, and the folded kernel is quantized per output channel
    (ops.quant). Inference-only; FrozenBN only (GN cannot fold — its
    statistics are runtime values).
    """
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    norm_init_scale: float = 1.0

    @nn.compact
    def __call__(self, xq, sx, *, relu, out_scale=None,
                 out_dtype=jnp.float32):
        """xq int8 (or float with sx=None -> dynamic), sx its scale.

        out_scale: requantize the (bias+relu'd) output to int8 with this
        calibrated scale — fused into the conv epilogue (the tensor
        crossing HBM is 1 byte/element).
        """
        from ..ops.quant import conv2d_int8
        cin = xq.shape[-1]
        k = _KernelParam((self.kernel, self.kernel, cin, self.features),
                         name="conv")()
        scale, bias = _NormParams(self.features,
                                  init_scale=self.norm_init_scale,
                                  name="norm")()
        w = k * scale  # fold FrozenBN into the kernel (per out channel)
        pad = ((self.padding, self.padding),) * 2
        return conv2d_int8(xq, w, bias, strides=(self.stride, self.stride),
                           padding=pad, relu=relu, sx=sx,
                           out_scale=out_scale, out_dtype=out_dtype)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) in NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def max_pool_1x1_s2(x):
    """Stride-2 subsample (detectron2's P6 from P5: MaxPool k1 s2)."""
    return x[:, ::2, ::2, :]
