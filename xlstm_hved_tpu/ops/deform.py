"""3D deformable convolution via trilinear gather.

Re-design of /root/reference/sa_modules/DeformableBlock3D.py:10-396 (a pure
PyTorch gather implementation; unused by the flagship but reachable via
ConvNorm(deform=True)). An offset conv predicts 3 offsets per kernel tap;
features are sampled at (tap position + offset) with trilinear interpolation
and reduced with a dense conv applied to the gathered stack.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def trilinear_sample(x: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (D, H, W, C) at float coords (..., 3) with border clamping."""
    D, H, W, C = x.shape
    cz, cy, cx = coords[..., 0], coords[..., 1], coords[..., 2]
    cz = jnp.clip(cz, 0.0, D - 1.0)
    cy = jnp.clip(cy, 0.0, H - 1.0)
    cx = jnp.clip(cx, 0.0, W - 1.0)
    z0 = jnp.floor(cz).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, D - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fz, fy, fx = cz - z0, cy - y0, cx - x0

    def g(zi, yi, xi):
        return x[zi, yi, xi]

    c000 = g(z0, y0, x0)
    c001 = g(z0, y0, x1)
    c010 = g(z0, y1, x0)
    c011 = g(z0, y1, x1)
    c100 = g(z1, y0, x0)
    c101 = g(z1, y0, x1)
    c110 = g(z1, y1, x0)
    c111 = g(z1, y1, x1)
    fz, fy, fx = (f[..., None] for f in (fz, fy, fx))
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


class DeformConv3d(nn.Module):
    """Deformable 3D conv: offset conv (3*k^3 channels) + trilinear gather +
    tap-wise projection (reference DeformConv3d)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        ks = self.kernel_size
        taps = ks ** 3
        offsets = nn.Conv(3 * taps, (ks,) * 3, strides=(self.stride,) * 3,
                          padding="SAME", dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="offset_conv")(x)
        B = x.shape[0]
        out_sp = offsets.shape[1:4]
        # base sampling grid (output voxel centers in input coords)
        grid = jnp.stack(jnp.meshgrid(
            jnp.arange(out_sp[0]) * self.stride,
            jnp.arange(out_sp[1]) * self.stride,
            jnp.arange(out_sp[2]) * self.stride, indexing="ij"),
            axis=-1).astype(jnp.float32)  # (D', H', W', 3)
        half = (ks - 1) // 2
        tap_offsets = jnp.stack(jnp.meshgrid(
            jnp.arange(ks) - half, jnp.arange(ks) - half,
            jnp.arange(ks) - half, indexing="ij"),
            axis=-1).reshape(taps, 3).astype(jnp.float32)

        offs = offsets.reshape(B, *out_sp, taps, 3).astype(jnp.float32)
        coords = (grid[None, :, :, :, None, :] + tap_offsets[None, None,
                  None, None] + offs)  # (B, D', H', W', taps, 3)

        def per_sample(xb, cb):
            return trilinear_sample(xb, cb)  # (D', H', W', taps, C)

        gathered = jax.vmap(per_sample)(x.astype(jnp.float32), coords)
        gathered = gathered.reshape(B, *out_sp, taps * x.shape[-1])
        y = nn.Conv(self.features, (1, 1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="proj")(gathered.astype(
                        x.dtype))
        return y


class AttDeformConv3d(nn.Module):
    """Attention-gated deformable conv (reference AttDeformConv3d,
    DeformableBlock3D.py:206-256): a 1x1 SE-reduction conv shrinks channels
    by `se_ratio`, the predicted offsets are gated by a spatial-attention map
    computed on the offset field, then the standard deformable gather +
    1x1 projection runs on the reduced features."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    se_ratio: int = 4
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        from xlstm_hved_tpu.nn.skr import SpatialAttention3D

        se_ch = max(x.shape[-1] // self.se_ratio, 1)
        x = nn.Conv(se_ch, (1, 1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="conv_se")(x)

        ks = self.kernel_size
        taps = ks ** 3
        offsets = nn.Conv(3 * taps, (ks,) * 3, strides=(self.stride,) * 3,
                          padding="SAME", dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="offset_conv")(x)
        offsets = offsets * SpatialAttention3D(name="att")(offsets)

        B = x.shape[0]
        out_sp = offsets.shape[1:4]
        grid = jnp.stack(jnp.meshgrid(
            jnp.arange(out_sp[0]) * self.stride,
            jnp.arange(out_sp[1]) * self.stride,
            jnp.arange(out_sp[2]) * self.stride, indexing="ij"),
            axis=-1).astype(jnp.float32)
        half = (ks - 1) // 2
        tap_offsets = jnp.stack(jnp.meshgrid(
            jnp.arange(ks) - half, jnp.arange(ks) - half,
            jnp.arange(ks) - half, indexing="ij"),
            axis=-1).reshape(taps, 3).astype(jnp.float32)
        offs = offsets.reshape(B, *out_sp, taps, 3).astype(jnp.float32)
        coords = (grid[None, :, :, :, None, :] + tap_offsets[None, None,
                  None, None] + offs)
        gathered = jax.vmap(trilinear_sample)(x.astype(jnp.float32), coords)
        gathered = gathered.reshape(B, *out_sp, taps * se_ch)
        return nn.Conv(self.features, (1, 1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, name="proj")(
            gathered.astype(x.dtype))
