"""U-HeMIS baseline (re-design of /root/reference/U_Hemis.py:14-168):
4 per-modality conv encoder streams -> per-level mean/var abstraction over
the PRESENT modalities -> 4 recon decoders + 1 seg decoder.

Channels-last; streams vmapped; the drop semantics (ZeroLayerF on every
skip, U_Hemis.py:42) become a constant keep-mask multiply.

NOTE the reference takes mean/var over all 4 streams including zeroed ones
(dropped streams still contribute zeros to the moments). We reproduce that
exactly — it is the published U-HeMIS behavior.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from xlstm_hved_tpu.nn.blocks import BasicConv, SingleConv, max_pool3d, resize_trilinear


class HemisBlock(nn.Module):
    """Two SingleConvs; encoder path narrows conv2 to out//2
    (reference ResBlock in U_Hemis.py:149-168 — not residual despite the
    name)."""

    features: int
    encoder: bool = False
    order: str = "ilc"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        if self.encoder:
            c1, c2 = self.features, self.features // 2
        else:
            c1, c2 = self.features, self.features
        x = SingleConv(c1, 3, 1, self.order, dtype=self.dtype, name="conv1")(x)
        x = SingleConv(c2, 3, 1, self.order, dtype=self.dtype, name="conv2")(x)
        return x


class HemisEncoder(nn.Module):
    """Per-modality encoder returning 4 skip levels with channels
    [n/2, n, 2n, 4n] (U_Hemis.py:65-96)."""

    n_base: int = 8
    order: str = "ilc"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        n = self.n_base
        x = BasicConv(n, 1, norm=False, relu=True, dtype=self.dtype,
                      name="init")(x)
        skips = []
        for i, feat in enumerate((n, 2 * n, 4 * n, 8 * n)):
            x = HemisBlock(feat, encoder=True, order=self.order,
                           dtype=self.dtype, name=f"block{i}")(x)
            skips.append(x)
            x = max_pool3d(x)
        return skips


def hemis_abstraction(stack: jnp.ndarray) -> jnp.ndarray:
    """concat(mean, var) over the modality axis (U_Hemis.py:98-109).
    stack: (M, B, D, H, W, C) -> (B, D, H, W, 2C). Uses the reference's
    torch.var (unbiased, ddof=1)."""
    mean = jnp.mean(stack, axis=0)
    var = jnp.var(stack, axis=0, ddof=1)
    return jnp.concatenate([mean, var], axis=-1)


class HemisDecoder(nn.Module):
    """3-level upsample+concat+block decoder (U_Hemis.py:112-147)."""

    num_cls: int
    n_base: int = 8
    order: str = "ilc"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, skips):
        n = self.n_base
        x = skips[3]
        for j, feat in enumerate((4 * n, 2 * n, n)):
            skip = skips[2 - j]
            x = resize_trilinear(x, skip.shape[1:4])
            x = jnp.concatenate([x, skip], axis=-1)
            x = HemisBlock(feat, encoder=False, order=self.order,
                           dtype=self.dtype, name=f"dec{j}")(x)
        # reference final_conv is BasicConv(..., relu=False, norm=False) with
        # the buildingblocks.py:14 bias=False default — no bias term
        return BasicConv(self.num_cls, 1, norm=False, relu=False,
                         dtype=self.dtype, name="final")(x)


class UHeMIS(nn.Module):
    num_cls: int = 3
    n_base: int = 8
    final_sigmoid: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, keep: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, D, H, W, 4). keep: (B, 4) or (4,) bool (None: infer from
        all-zero channels like U_Hemis.py:35-36)."""
        M = x.shape[-1]
        if keep is None:
            keep = jnp.sum(jnp.abs(x), axis=(1, 2, 3)) != 0  # (B, M)
        keep = keep.astype(x.dtype)
        if keep.ndim == 1:
            keep = jnp.broadcast_to(keep[None], (x.shape[0], M))

        vmapped = nn.vmap(
            HemisEncoder, in_axes=0, out_axes=0,
            variable_axes={"params": 0}, split_rngs={"params": True})
        xs = jnp.moveaxis(x, -1, 0)[..., None]  # (M, B, ..., 1)
        skips_m = vmapped(self.n_base, dtype=self.dtype,
                          name="encoders")(xs)  # list of (M, B, ..., C)

        km = jnp.moveaxis(keep, -1, 0)[..., None, None, None, None]
        fused = [hemis_abstraction(s * km) for s in skips_m]

        recons = []
        for i in range(M):
            recons.append(HemisDecoder(1, self.n_base, dtype=self.dtype,
                                       name=f"recon_decoder_{i}")(fused))
        recon_out = jnp.concatenate(recons, axis=-1)
        seg = HemisDecoder(self.num_cls, self.n_base, dtype=self.dtype,
                           name="seg_decoder")(fused)
        seg = nn.sigmoid(seg) if self.final_sigmoid else nn.softmax(seg, axis=-1)
        return seg, recon_out
