"""Standalone Vision-LSTM classifiers (component parity with the vendored
VisionLSTM / VisionLSTM3D, /root/reference/UxLSTM/nnunetv2/nets/
vision_lstm.py:509-780, and the hierarchical patch encoder :782-1135 —
unused by the flagship but part of the subsystem surface).

ViT-style: conv patch embed + learned pos embed + alternating-direction
ViLBlocks + bilateral-average pooling + linear head. 2D and 3D variants.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_hved_tpu.nn.vil import ResidualLayerNorm, ViLBlock


def interpolate_sincos(embed: jnp.ndarray, seqlens: Sequence[int],
                       method: str = "cubic") -> jnp.ndarray:
    """Resample a grid-shaped pos embed (1, *grid, dim) to a new grid
    (reference interpolate_sincos, vision_lstm_util.py:28-36; bicubic)."""
    assert embed.ndim - 2 == len(seqlens)
    return jax.image.resize(
        embed, (1, *seqlens, embed.shape[-1]), method=method)


class VitPosEmbedND(nn.Module):
    """Learned grid pos embed with resolution interpolation
    (reference VitPosEmbed2d/3d, vision_lstm_util.py:84-130): the param is
    stored at the train-time grid; at a different input resolution it is
    bicubic-resampled, enabling train-small/finetune-large transfer."""

    dim: int
    seqlens: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):  # (B, *grid, dim)
        embed = self.param(
            "embed", nn.initializers.truncated_normal(stddev=0.02),
            (1, *self.seqlens, self.dim))
        if x.shape[1:] != embed.shape[1:]:
            embed = interpolate_sincos(embed, x.shape[1:-1])
        return x + embed.astype(x.dtype)


class PatchEmbed(nn.Module):
    """Non-overlapping conv patch embedding for N-D inputs
    (reference VitPatchEmbed, vision_lstm_util.py:12-82)."""

    dim: int
    patch_size: int = 16
    spatial_ndim: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        p = (self.patch_size,) * self.spatial_ndim
        x = nn.Conv(self.dim, kernel_size=p, strides=p, padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        grid = x.shape[1:-1]
        return x.reshape(x.shape[0], -1, self.dim), grid


class VisionLSTMEncoder(nn.Module):
    """Pos embed + depth x alternating-direction ViLBlock + final LN
    (vision_lstm.py:560-660)."""

    dim: int = 192
    depth: int = 12
    chunk_size: int = 128
    seqlens: Optional[Tuple[int, ...]] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, tokens, grid: Optional[Tuple[int, ...]] = None):
        B, S, _ = tokens.shape
        if self.seqlens is not None:
            # grid-shaped embed, resolution-interpolatable (VitPosEmbed)
            g = tuple(grid) if grid is not None else tuple(self.seqlens)
            x = VitPosEmbedND(self.dim, tuple(self.seqlens),
                              name="pos_embed_nd")(
                tokens.reshape(B, *g, self.dim)).reshape(B, S, self.dim)
        else:
            pos = self.param("pos_embed", nn.initializers.normal(stddev=0.02),
                             (1, S, self.dim))
            x = tokens + pos
        for i in range(self.depth):
            x = ViLBlock(self.dim, reverse=i % 2 == 1,
                         chunk_size=self.chunk_size, dtype=self.dtype,
                         name=f"block{i}")(x)
        return ResidualLayerNorm(name="norm")(x)


def bilateral_avg(x: jnp.ndarray) -> jnp.ndarray:
    """Mean of the first and last token (reference pooling='bilateral_avg',
    vision_lstm.py:700-715)."""
    return 0.5 * (x[:, 0] + x[:, -1])


class VisionLSTM(nn.Module):
    """2D image classifier (reference VisionLSTM, vision_lstm.py:509-780)."""

    dim: int = 192
    depth: int = 12
    num_classes: int = 1000
    patch_size: int = 16
    chunk_size: int = 128
    pos_grid: Optional[Tuple[int, ...]] = None  # train-time grid, for
    # resolution transfer (pos embed interpolates to other input sizes)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        tokens, grid = PatchEmbed(self.dim, self.patch_size, 2,
                                  dtype=self.dtype, name="patch_embed")(x)
        x = VisionLSTMEncoder(self.dim, self.depth, self.chunk_size,
                              seqlens=tuple(self.pos_grid or grid),
                              dtype=self.dtype,
                              name="encoder")(tokens, grid=grid)
        pooled = bilateral_avg(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="head")(pooled)


class VisionLSTM3D(nn.Module):
    """3D volume classifier (reference VisionLSTM3D)."""

    dim: int = 192
    depth: int = 12
    num_classes: int = 2
    patch_size: int = 8
    chunk_size: int = 128
    pos_grid: Optional[Tuple[int, ...]] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        tokens, grid = PatchEmbed(self.dim, self.patch_size, 3,
                                  dtype=self.dtype, name="patch_embed")(x)
        x = VisionLSTMEncoder(self.dim, self.depth, self.chunk_size,
                              seqlens=tuple(self.pos_grid or grid),
                              dtype=self.dtype,
                              name="encoder")(tokens, grid=grid)
        pooled = bilateral_avg(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="head")(pooled)


class ViL3DPatchEncoder(nn.Module):
    """4-stage hierarchical ViL encoder: per-stage conv patch embed pyramid +
    ViL blocks (reference VIL3DPatchEncoder('3dconv'),
    vision_lstm.py:782-1135). Returns the per-stage feature maps."""

    dims: Tuple[int, ...] = (32, 64, 128, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    chunk_size: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):  # (B, D, H, W, C)
        feats = []
        for stage, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            stride = 4 if stage == 0 else 2
            x = nn.Conv(dim, kernel_size=(stride,) * 3,
                        strides=(stride,) * 3, padding="VALID",
                        dtype=self.dtype, name=f"embed{stage}")(x)
            b = x.shape[0]
            grid = x.shape[1:4]
            tokens = x.reshape(b, -1, dim)
            for i in range(depth):
                tokens = ViLBlock(dim, reverse=i % 2 == 1,
                                  chunk_size=self.chunk_size,
                                  dtype=self.dtype,
                                  name=f"stage{stage}_block{i}")(tokens)
            x = tokens.reshape(b, *grid, dim)
            feats.append(x)
        return feats
