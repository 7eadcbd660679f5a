"""Skip-return (Skr) path blocks and spatial attention.

Re-design of /root/reference/sa_modules/sa_module.py (ConvNorm, DWConvNorm,
ResBlock with lkdw depthwise-separable convs) and
/root/reference/sa_modules/attention_blocks.py:112-125 (SpacialAttention3D),
used by the flagship's raw-input skip-return gating
(/root/reference/RA_HVED.py:369-384, 549-552, 617-621).
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
        return jnp.where(x >= 0, x, a * x)


class ConvNorm(nn.Module):
    """conv -> norm -> activation (reference ConvNorm, BATCH/INSTANCE mode)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    leaky: bool = True  # PReLU when True else ReLU
    norm: str = "BATCH"
    activation: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import Conv3DFast
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
        x = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype, name="pwconv")(x)
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
