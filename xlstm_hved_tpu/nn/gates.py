"""CBAM-family gates and the non-MVAE fusion module.

Re-design of /root/reference/buildingblocks.py:13-186 (BasicConv is in
nn/blocks.py): ChannelGate, ModalityGate (per-modality scalar gates),
SpatialGate, FusionModule (the fusion=True path of the HVED engine,
RA_HVED.py:561-562), and the PatchGAN discriminator block (:342-358).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from xlstm_hved_tpu.nn.blocks import BasicConv, ChannelPool

Dtype = Any


class ChannelGate(nn.Module):
    """avg+max pooled MLP channel gate (buildingblocks.py:37-79)."""

    channels: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        hidden = max(self.channels // self.reduction, 2)
        mlp = nn.Sequential([
            nn.Dense(hidden, dtype=self.dtype),
            nn.relu,
            nn.Dense(self.channels, dtype=self.dtype),
        ])
        avg = jnp.mean(x, axis=(1, 2, 3))
        mx = jnp.max(x, axis=(1, 2, 3))
        att = mlp(avg) + mlp(mx)
        scale = nn.sigmoid(att)[:, None, None, None, :]
        return x * scale


class ModalityGate(nn.Module):
    """Per-modality scalar gates from pooled stats (buildingblocks.py:81-128).
    Returns the list of scaled per-modality chunks."""

    channels: int
    in_modalities: int = 4
    reduction: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        hidden = self.channels // self.reduction
        mlp = nn.Sequential([
            nn.Dense(hidden, dtype=self.dtype),
            nn.relu,
            nn.Dense(self.in_modalities, dtype=self.dtype),
        ])
        avg = jnp.mean(x, axis=(1, 2, 3))
        mx = jnp.max(x, axis=(1, 2, 3))
        scale = nn.sigmoid(mlp(avg) + mlp(mx))  # (B, M)
        mod_ch = self.channels // self.in_modalities
        outs = []
        for i in range(self.in_modalities):
            chunk = x[..., mod_ch * i: mod_ch * (i + 1)]
            outs.append(chunk * scale[:, None, None, None, i: i + 1])
        return outs


class SpatialGate(nn.Module):
    """ChannelPool -> 7^3 conv -> sigmoid spatial gate
    (buildingblocks.py:140-158)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, prob=None):
        comp = ChannelPool()(x)
        if prob is not None:
            comp = jnp.concatenate([comp, prob], axis=-1)
        gate = BasicConv(1, 7, relu=False, dtype=self.dtype,
                         name="spatial")(comp)
        return x * nn.sigmoid(gate)


class FusionModule(nn.Module):
    """Gate + 1x1 compress over concatenated modality features — the
    fusion=True (non-MVAE) HVED path (buildingblocks.py:160-186)."""

    gate_channels: int
    mode: str = "modal"
    in_modalities: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        x = jnp.concatenate(list(xs), axis=-1) if isinstance(xs, (list, tuple)) else xs
        in_ch = x.shape[-1]
        if self.mode == "ch":
            gated = ChannelGate(in_ch, dtype=self.dtype, name="gate")(x)
            gated_list = [gated]
            cat = gated
        else:
            gated_list = ModalityGate(in_ch, self.in_modalities,
                                      dtype=self.dtype, name="gate")(x)
            cat = jnp.concatenate(gated_list, axis=-1)
        out = BasicConv(self.gate_channels, 1, dtype=self.dtype,
                        name="compress")(cat)
        return out, gated_list


def disc_padding(k: int):
    return ((1, 1),) * 3


class DiscriminatorBlock(nn.Module):
    """conv(+InstanceNorm)+LeakyReLU(0.2) downsampling block
    (buildingblocks.py:342-358)."""

    features: int
    kernel: int = 3
    stride: int = 2
    normalize: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from xlstm_hved_tpu.nn.blocks import Conv3DFast, instance_norm

        # Routed through the tuned depth-fold conv (ops/conv3d.py) with the
        # reference's explicit p=1 padding — XLA:TPU's direct 3D lowering of
        # these k=4 64-512ch convs was most of the train step (the D passes
        # measured ~8x slower than the folded 2D form). Param path/init match
        # the previous nn.Conv ("Conv_0", lecun_normal), so checkpoints and
        # the torch transplant mapping are unchanged.
        x = Conv3DFast(self.features, self.kernel, stride=self.stride,
                       padding=disc_padding(self.kernel),
                       kernel_init=nn.initializers.lecun_normal(),
                       dtype=self.dtype, name="Conv_0")(x)
        if self.normalize:
            x = instance_norm(x)
        return nn.leaky_relu(x, negative_slope=0.2)
