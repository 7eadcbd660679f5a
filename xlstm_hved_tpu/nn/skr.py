"""Skip-return (Skr) path blocks, spatial attention, and the auxiliary
attention heads.

Re-design of /root/reference/sa_modules/sa_module.py:10-239 (ConvNorm,
DWConvNorm, ResBlock with lkdw depthwise-separable convs, ResFormerBlock,
ResBottleneck, ScaleUpsample, AttentionConnection) and
/root/reference/sa_modules/attention_blocks.py:4-125 (AttentionGate,
ParallelDecoder, FCNHead, SENet3D, SpacialAttention3D). The flagship uses
the skip-return gating subset (/root/reference/RA_HVED.py:369-384, 549-552,
617-621); the rest are auxiliary heads kept for component parity.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch nn.PReLU default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init), ())
        # compute in x.dtype: the f32 scalar would otherwise promote the
        # whole downstream gate chain to f32 (a 134 MB full-res f32 add
        # showed up in the HLO traffic dump from exactly this)
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ConvNorm(nn.Module):
    """conv -> norm -> activation (reference ConvNorm, BATCH/INSTANCE mode)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    leaky: bool = True  # PReLU when True else ReLU
    norm: str = "BATCH"
    activation: bool = True
    deform: bool = False  # route through DeformConv3d (sa_module.py:26-28)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import Conv3DFast
        if self.deform:
            from xlstm_hved_tpu.ops.deform import DeformConv3d
            x = DeformConv3d(self.features, self.kernel_size, self.stride,
                             dtype=self.dtype, name="conv")(x)
        else:
            x = Conv3DFast(self.features, self.kernel_size, self.stride,
                           use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.norm == "BATCH":
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        elif self.norm == "INSTANCE":
            from xlstm_hved_tpu.nn.blocks import instance_norm
            x = instance_norm(x)
        if self.activation:
            x = PReLU(name="act")(x) if self.leaky else nn.relu(x)
        return x


class DWConvNorm(nn.Module):
    """Depthwise conv + pointwise conv + norm + activation (reference
    DWConvNorm, sa_module.py:56-97)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    leaky: bool = True
    norm: str = "BATCH"
    activation: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import BlockDiagConv
        in_ch = x.shape[-1]
        x = BlockDiagConv(in_ch, 1, self.kernel_size, self.stride,
                          use_bias=False, dtype=self.dtype, name="dwconv")(x)
        from xlstm_hved_tpu.nn.blocks import Conv1x1
        x = Conv1x1(self.features, dtype=self.dtype, name="pwconv")(x)
        if self.norm == "BATCH":
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        elif self.norm == "INSTANCE":
            from xlstm_hved_tpu.nn.blocks import instance_norm
            x = instance_norm(x)
        if self.activation:
            x = PReLU(name="act")(x) if self.leaky else nn.relu(x)
        return x


class ResBlock(nn.Module):
    """Residual block; lkdw=True uses depthwise-separable 3^3 convs
    (reference ResBlock, sa_module.py:99-137)."""

    features: int
    stride: int = 1
    leaky: bool = False
    lkdw: bool = False
    norm: str = "BATCH"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        conv = DWConvNorm if self.lkdw else ConvNorm
        out = conv(self.features, 3, self.stride, leaky=self.leaky,
                   norm=self.norm, activation=True, dtype=self.dtype,
                   name="conv1")(x, train=train)
        out = conv(self.features, 3, 1, leaky=self.leaky, norm=self.norm,
                   activation=self.lkdw, dtype=self.dtype,
                   name="conv2")(out, train=train)
        identity = x
        if in_ch != self.features or self.stride != 1:
            identity = ConvNorm(self.features, 1, self.stride, leaky=self.leaky,
                                norm=self.norm, activation=False,
                                dtype=self.dtype, name="identity")(x, train=train)
        out = out + identity
        out = PReLU(name="act")(out) if self.leaky else nn.relu(out)
        return out


class SpatialAttention3D(nn.Module):
    """max+mean channel pool -> k^3 conv -> sigmoid map; returns the GATE
    (not gated input), as the reference does (attention_blocks.py:112-125)."""

    kernel_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.mean(x, axis=-1, keepdims=True)
        from xlstm_hved_tpu.nn.blocks import Conv3DFast
        pooled = jnp.concatenate([mx, mn], axis=-1)
        out = Conv3DFast(1, self.kernel_size, use_bias=False,
                         dtype=self.dtype, name="conv")(pooled)
        return nn.sigmoid(out)


class SkrGate(nn.Module):
    """ResBlock(lkdw) + SpatialAttention3D(k=1) as used for each skip-return
    gate (/root/reference/RA_HVED.py:371-373, 382-384)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ResBlock(self.features, lkdw=True, dtype=self.dtype,
                     name="res")(x, train=train)
        return SpatialAttention3D(kernel_size=1, dtype=self.dtype,
                                  name="sa")(y)


class ResFormerBlock(nn.Module):
    """ResBlock that also returns the first-conv activation (reference
    ResFormerBlock, sa_module.py:139-177); used where a mid-feature tap is
    needed. Returns (mid, out)."""

    features: int
    stride: int = 1
    leaky: bool = False
    lkdw: bool = False
    norm: str = "BATCH"
    deform: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        if self.lkdw:
            mid = DWConvNorm(self.features, 3, self.stride, leaky=self.leaky,
                             norm=self.norm, activation=True,
                             dtype=self.dtype, name="conv1")(x, train=train)
            out = DWConvNorm(self.features, 3, 1, leaky=self.leaky,
                             norm=self.norm, activation=True,
                             dtype=self.dtype, name="conv2")(mid, train=train)
        else:
            mid = ConvNorm(self.features, 3, self.stride, leaky=self.leaky,
                           norm=self.norm, activation=True, deform=self.deform,
                           dtype=self.dtype, name="conv1")(x, train=train)
            out = ConvNorm(self.features, 3, 1, leaky=self.leaky,
                           norm=self.norm, activation=False,
                           dtype=self.dtype, name="conv2")(mid, train=train)
        identity = x
        if in_ch != self.features or self.stride != 1:
            identity = ConvNorm(self.features, 1, self.stride,
                                leaky=self.leaky, norm=self.norm,
                                activation=False, dtype=self.dtype,
                                name="identity")(x, train=train)
        out = out + identity
        out = PReLU(name="act")(out) if self.leaky else nn.relu(out)
        return mid, out


class ResBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck residual (reference ResBottleneck,
    sa_module.py:180-210; middle width = in_channels // 4)."""

    features: int
    stride: int = 1
    leaky: bool = False
    norm: str = "BATCH"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        mid_ch = max(in_ch // 4, 1)
        out = ConvNorm(mid_ch, 1, 1, leaky=self.leaky, norm=self.norm,
                       activation=True, dtype=self.dtype,
                       name="conv1")(x, train=train)
        out = ConvNorm(mid_ch, 3, self.stride, leaky=self.leaky,
                       norm=self.norm, activation=True, dtype=self.dtype,
                       name="conv2")(out, train=train)
        out = ConvNorm(self.features, 1, 1, leaky=self.leaky, norm=self.norm,
                       activation=False, dtype=self.dtype,
                       name="conv3")(out, train=train)
        identity = x
        if in_ch != self.features or self.stride != 1:
            identity = ConvNorm(self.features, 1, self.stride,
                                leaky=self.leaky, norm=self.norm,
                                activation=False, dtype=self.dtype,
                                name="identity")(x, train=train)
        out = out + identity
        return PReLU(name="act")(out) if self.leaky else nn.relu(out)


class ScaleUpsample(nn.Module):
    """Trilinear scale-factor upsample; the reference's use_deconv branch
    (ConvTranspose3d) is replaced by resize + 3^3 conv, the TPU-friendly
    equivalent this repo uses everywhere (reference ScaleUpsample,
    sa_module.py:213-229)."""

    scale_factor: int = 2
    use_deconv: bool = False
    features: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from xlstm_hved_tpu.nn.blocks import Conv3DFast, resize_trilinear
        size = tuple(s * self.scale_factor for s in x.shape[1:4])
        y = resize_trilinear(x, size)
        if self.use_deconv:
            y = Conv3DFast(self.features or x.shape[-1], 3,
                           dtype=self.dtype, name="conv")(y)
        return y


class AttentionConnection(nn.Module):
    """(factor + attention) * feature with a learnable scalar factor
    (reference AttentionConnection, sa_module.py:232-239)."""

    factor: float = 1.0

    @nn.compact
    def __call__(self, feature, attention):
        p = self.param("factor", nn.initializers.constant(self.factor), (1,))
        return (p + attention) * feature


class AttentionGate(nn.Module):
    """Additive attention gate over a skip connection (reference
    AttentionGate, attention_blocks.py:4-26): gate signal g (coarse) +
    stride-2-reduced skip x -> psi map, upsampled and applied to x."""

    features_int: int
    norm: str = "BATCH"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import resize_trilinear
        g1 = ConvNorm(self.features_int, 1, 1, norm=self.norm,
                      activation=False, dtype=self.dtype,
                      name="w_g")(g, train=train)
        x1 = ConvNorm(self.features_int, 1, 2, norm=self.norm,
                      activation=False, dtype=self.dtype,
                      name="w_x")(x, train=train)
        psi = nn.relu(g1 + x1)
        psi = ConvNorm(1, 1, 1, norm=self.norm, activation=False,
                       dtype=self.dtype, name="psi")(psi, train=train)
        psi = nn.sigmoid(psi)
        return x * resize_trilinear(psi, x.shape[1:4])


class ParallelDecoder(nn.Module):
    """Three-scale parallel fusion head (reference ParallelDecoder,
    attention_blocks.py:29-62): project each scale to mid-channels at the
    finest resolution, fuse coarse->fine, concat, 1x1 out."""

    out_features: int
    norm: str = "BATCH"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x3, x4, x5, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import resize_trilinear
        mid = max(x3.shape[-1] // 2, 1)
        size = x3.shape[1:4]
        f3 = ConvNorm(mid, 1, 1, norm=self.norm, dtype=self.dtype,
                      name="conv3_0")(x3, train=train)
        f4 = ConvNorm(mid, 1, 1, norm=self.norm, dtype=self.dtype,
                      name="conv4_0")(resize_trilinear(x4, size), train=train)
        level5 = ConvNorm(mid, 1, 1, norm=self.norm, dtype=self.dtype,
                          name="conv5_0")(resize_trilinear(x5, size),
                                          train=train)
        level4 = ConvNorm(mid, 3, 1, norm=self.norm, dtype=self.dtype,
                          name="conv4_5")(
            jnp.concatenate([f4, level5], axis=-1), train=train)
        level3 = ConvNorm(mid, 3, 1, norm=self.norm, dtype=self.dtype,
                          name="conv3_4")(
            jnp.concatenate([f3, level4], axis=-1), train=train)
        fused = jnp.concatenate([level3, level4, level5], axis=-1)
        from xlstm_hved_tpu.nn.blocks import Conv1x1
        return Conv1x1(self.out_features, dtype=self.dtype,
                       name="conv_out")(fused)


class FCNHead(nn.Module):
    """Coarse-to-fine FCN refinement head (reference FCNHead,
    attention_blocks.py:65-88)."""

    out_features: int
    norm: str = "BATCH"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x3, x4, x5, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import resize_trilinear
        x5_up = ConvNorm(x4.shape[-1], 1, 1, norm=self.norm, dtype=self.dtype,
                         name="conv5_4")(resize_trilinear(x5, x4.shape[1:4]),
                                         train=train)
        x4_ref = ConvNorm(x4.shape[-1], 3, 1, norm=self.norm,
                          dtype=self.dtype,
                          name="conv4_0")(x5_up + x4, train=train)
        x4_up = ConvNorm(x3.shape[-1], 1, 1, norm=self.norm, dtype=self.dtype,
                         name="conv4_3")(
            resize_trilinear(x4_ref, x3.shape[1:4]), train=train)
        x3_ref = ConvNorm(x3.shape[-1], 3, 1, norm=self.norm,
                          dtype=self.dtype,
                          name="conv3_0")(x4_up + x3, train=train)
        from xlstm_hved_tpu.nn.blocks import Conv1x1
        return Conv1x1(self.out_features, dtype=self.dtype,
                       name="conv_out")(x3_ref)


class SENet3D(nn.Module):
    """Channel squeeze-excitation (reference SENet3D,
    attention_blocks.py:90-110)."""

    ratio: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        avg = jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        h = nn.Dense(max(c // self.ratio, 1), use_bias=False,
                     dtype=self.dtype, name="fc1")(avg)
        h = nn.relu(h)
        h = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(h)
        gate = nn.sigmoid(h)
        return x * gate[:, None, None, None, :]
