"""DuSE / SFECA — dual-branch squeeze-fusion-excitation cross-awareness.

Re-design of /root/reference/modules/DuSFE.py:89-155 (DuSEAttention, the
module coupling the seg and recon decoder branches level-by-level) plus the
auxiliary RDB / dense blocks (:161-197) for component parity.

Channels-last; BatchNorm uses flax batch_stats (train flag threads through).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from xlstm_hved_tpu.nn.blocks import Conv1x1

Dtype = Any


class DuSEAttention(nn.Module):
    """Two branches (recon features, seg features):
    (1) spatial squeeze (global avg pool) -> shared FC -> per-branch sigmoid
        channel excitation;
    (2) channel squeeze (1x1 conv to 1ch per branch) -> fuse -> per-branch 3^3
        conv sigmoid spatial excitation;
    (3) per-branch BatchNorm(x + scSE + csSE).
    Matches /root/reference/modules/DuSFE.py:89-155.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = False):
        c = self.features
        # (1) spatial-squeeze + channel-excitation
        sq1 = jnp.mean(x1, axis=(1, 2, 3))  # (B, C)
        sq2 = jnp.mean(x2, axis=(1, 2, 3))
        comb = nn.Dense(c, dtype=self.dtype, name="fc_comb")(
            jnp.concatenate([sq1, sq2], axis=-1)
        )
        g1 = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc_ch1")(comb))
        g2 = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc_ch2")(comb))
        x1_sc = x1 * g1[:, None, None, None, :]
        x2_sc = x2 * g2[:, None, None, None, :]

        # (2) channel-squeeze + spatial-excitation
        s1 = Conv1x1(1, dtype=self.dtype, name="conv_squeeze_ch1")(x1)
        s2 = Conv1x1(1, dtype=self.dtype, name="conv_squeeze_ch2")(x2)
        fused = Conv1x1(1, dtype=self.dtype, name="conv_comb")(
            jnp.concatenate([s1, s2], axis=-1)
        )
        from xlstm_hved_tpu.nn.blocks import Conv3DFast
        a1 = nn.sigmoid(Conv3DFast(1, 3, dtype=self.dtype,
                                   name="conv_adjust_ch1")(fused))
        a2 = nn.sigmoid(Conv3DFast(1, 3, dtype=self.dtype,
                                   name="conv_adjust_ch2")(fused))
        x1_cs = x1 * a1
        x2_cs = x2 * a2

        # (3) fuse
        y1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="bn_fuse_ch1")(x1 + x1_sc + x1_cs)
        y2 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                          name="bn_fuse_ch2")(x2 + x2_sc + x2_cs)
        return y1, y2


class MakeDense(nn.Module):
    """Dense-growth conv block (reference make_dense, DuSFE.py:182-197)."""

    growth: int
    use_bn: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import Conv3DFast
        y = Conv3DFast(self.growth, 3, use_bias=False, dtype=self.dtype)(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        return jnp.concatenate([x, y], axis=-1)


class RDB(nn.Module):
    """Residual dense block (reference RDB, DuSFE.py:161-178)."""

    features: int
    num_dense: int = 4
    growth: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = x
        for i in range(self.num_dense):
            y = MakeDense(self.growth, dtype=self.dtype, name=f"dense{i}")(
                y, train=train)
        y = Conv1x1(self.features, use_bias=False, dtype=self.dtype,
                    name="conv_1x1")(y)
        return y + x


class DuRegisterDuSE(nn.Module):
    """Dual-branch cross-modality rigid-registration head (reference
    DuRegister_DuSE, /root/reference/modules/DuSFE.py:11-83): per-branch
    conv+BN stem, three levels of (RDB -> DuSE cross-talk -> avg-pool /2),
    concat -> RDB -> conv stack -> MLP emitting 6 rigid transform params.

    The reference hardcodes the flatten width to a 80x80x40 input
    (fc1 = Linear(16*10*10*5, ...), DuSFE.py:40); here the MLP adapts to
    whatever spatial size reaches it (flax shape inference), so any
    /8-divisible volume works.
    """

    features: int = 32
    out_params: int = 6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import Conv3DFast, avg_pool3d

        c = self.features
        x1 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                  dtype=self.dtype, name="bn_in_c1")(
            Conv3DFast(c, 3, dtype=self.dtype, name="conv_in_c1")(x1)))
        x2 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                  dtype=self.dtype, name="bn_in_c2")(
            Conv3DFast(c, 3, dtype=self.dtype, name="conv_in_c2")(x2)))
        for lvl in range(3):
            x1 = RDB(c, dtype=self.dtype, name=f"rdb{lvl}_c1")(x1, train=train)
            x2 = RDB(c, dtype=self.dtype, name=f"rdb{lvl}_c2")(x2, train=train)
            x1, x2 = DuSEAttention(c, dtype=self.dtype,
                                   name=f"duse{lvl}")(x1, x2, train=train)
            x1 = avg_pool3d(x1, 2)
            x2 = avg_pool3d(x2, 2)

        comb = jnp.concatenate([x1, x2], axis=-1)
        comb = RDB(2 * c, growth=64, dtype=self.dtype,
                   name="rdb_comb")(comb, train=train)
        comb = nn.relu(nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="bn1_comb")(
            Conv3DFast(c, 3, dtype=self.dtype, name="conv1_comb")(comb)))
        comb = Conv3DFast(16, 3, dtype=self.dtype, name="conv2_comb")(comb)

        flat = comb.reshape(comb.shape[0], -1)
        flat = nn.Dense(1024, dtype=self.dtype, name="fc1")(flat)
        flat = nn.Dense(128, dtype=self.dtype, name="fc2")(flat)
        flat = nn.Dense(16, dtype=self.dtype, name="fc3")(flat)
        return nn.Dense(self.out_params, dtype=self.dtype, name="fc4")(flat)
