"""UxLSTM nnU-Net family, TPU-native (2D and 3D).

Capability parity with the vendored nnU-Net nets in the reference:
- `ResidualXlstmEncoder` / `UNetResDecoder` / `UXlstmEnc`
  (/root/reference/UxLSTM/nnunetv2/nets/UxLSTMEnc_3d.py:90-554 and the 2D
  twin UxLSTMEnc_2d.py) — residual conv stages with a per-stage mixer that
  is a conv block for stages < 3 and a ViL layer for deeper stages,
  switching to channel-tokens when the feature map has fewer voxels than
  channels (UxLSTMEnc_3d.py:168-179).
- `UXlstmBot` (UxLSTMBot_3d.py:360-445, UxLSTMBot_2d.py) — same U-Net but
  ViL only at the bottleneck.
- `build_uxlstm_from_plans` replaces `get_uxlstm_enc_3d_from_plans`
  (UxLSTMEnc_3d.py:501-554): instead of requiring nnunetv2
  PlansManager/ConfigurationManager objects, it consumes a plain dict with
  the same fields, so the factory has no torch/nnunetv2 dependency.

Design notes (TPU-first, not a translation):
- channel-last layout (B, *spatial, C); convs lower straight onto the MXU.
- norm_op is instance norm (the reference's get_matching_instancenorm)
  computed in fp32; nonlin LeakyReLU(1e-2) matching nnU-Net defaults.
- nearest upsampling is an integer `jnp.repeat` per axis (static scale), not
  a gather — XLA fuses it into the following 1x1 conv (UpsampleLayer,
  UxLSTMEnc_3d.py:23-40).
- the ViL mixer reuses this repo's chunked-scan mLSTM (ops/mlstm.py), linear
  in sequence length, instead of the reference's O(S^2) form.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xlstm_hved_tpu.nn.vil import ViLBlock

Dtype = Any


def _instance_norm_nd(x: jnp.ndarray, scale, bias, eps: float = 1e-5):
    """Affine instance norm over all spatial axes, fp32 statistics."""
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class InstanceNormND(nn.Module):
    """norm_op of the plans factory: InstanceNorm{2,3}d(eps=1e-5, affine=True)
    (UxLSTMEnc_3d.py:527-528)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _instance_norm_nd(x, scale, bias, self.eps)


class ResBlockND(nn.Module):
    """BasicResBlock (UxLSTMEnc_3d.py:90-127) == dynamic_network_architectures
    BasicBlockD when `use_1x1conv` is driven by shape change:
    conv-norm-act, conv-norm, (+1x1-projected) skip, act."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    use_1x1conv: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        ks = self.kernel_size
        ks = (ks,) * ndim if isinstance(ks, int) else tuple(ks)
        st = self.stride
        st = (st,) * ndim if isinstance(st, int) else tuple(st)

        # explicit symmetric k//2 padding (the reference's conv_pad_sizes,
        # UxLSTMEnc_3d.py:181-183) — flax "SAME" pads (0, 1) under stride 2,
        # which samples windows one pixel off torch's symmetric padding
        pad = [(k // 2, k // 2) for k in ks]
        y = nn.Conv(self.features, kernel_size=ks, strides=st, padding=pad,
                    dtype=self.dtype, name="conv1")(x)
        y = InstanceNormND(self.features, name="norm1")(y)
        y = nn.leaky_relu(y, negative_slope=1e-2)
        y = nn.Conv(self.features, kernel_size=ks, padding=pad,
                    dtype=self.dtype, name="conv2")(y)
        y = InstanceNormND(self.features, name="norm2")(y)
        if self.use_1x1conv or x.shape[-1] != self.features or any(
                s != 1 for s in st):
            x = nn.Conv(self.features, kernel_size=(1,) * ndim, strides=st,
                        dtype=self.dtype, name="conv3")(x)
        return nn.leaky_relu(y + x, negative_slope=1e-2)


class ViLMixerND(nn.Module):
    """ViLLayer wrapper for any spatial rank (UxLSTMEnc_3d.py:42-87):
    patch-token mode flattens spatial dims to the sequence; channel-token
    mode uses channels as tokens and flattened spatial dims as features.
    Forced fp32 like the reference's @autocast(enabled=False)."""

    dim: int
    channel_token: bool = False
    chunk_size: int = 128

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        b = x.shape[0]
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        if self.channel_token:
            flat = x.reshape(b, -1, c).transpose(0, 2, 1)  # (B, C, S)
            y = ViLBlock(self.dim, chunk_size=self.chunk_size,
                         name="vil")(flat)
            y = y.transpose(0, 2, 1).reshape(b, *spatial, c)
        else:
            assert c == self.dim
            flat = x.reshape(b, -1, c)
            y = ViLBlock(self.dim, chunk_size=self.chunk_size,
                         name="vil")(flat)
            y = y.reshape(b, *spatial, c)
        return y.astype(orig_dtype)


def _per_stage(value, n_stages: int) -> List:
    if isinstance(value, int):
        return [value] * n_stages
    return list(value)


def _stage_strides(strides, n_stages: int, ndim: int) -> List[Tuple[int, ...]]:
    out = []
    for s in _per_stage(strides, n_stages):
        out.append((s,) * ndim if isinstance(s, int) else tuple(s))
    return out


def _stage_kernels(kernels, n_stages: int, ndim: int) -> List[Tuple[int, ...]]:
    out = []
    for k in _per_stage(kernels, n_stages):
        out.append((k,) * ndim if isinstance(k, int) else tuple(k))
    return out


def mixer_schedule(n_stages: int, ndim: int) -> List[str]:
    """Per-stage encoder mixer kind, matching the reference files exactly.

    The reference's "2D twin" is NOT a twin: UxLSTMEnc_3d.py:252-273 places a
    conv mixer on stages 0-2 and ViL on 3+, while UxLSTMEnc_2d.py:257-285
    places ViL on stages of the parity that guarantees the last stage gets
    one (`bool(s%2) ^ bool(n_stages%2) and s > 1`), a conv mixer only on
    stage 1, and Identity elsewhere."""
    if ndim == 3:
        return ["conv" if s < 3 else "vil" for s in range(n_stages)]
    out = []
    for s in range(n_stages):
        if (s % 2 == 1) != (n_stages % 2 == 1) and s > 1:
            out.append("vil")
        elif s == 1:
            out.append("conv")
        else:
            out.append("none")
    return out


def channel_token_schedule(input_size: Sequence[int],
                           features_per_stage: Sequence[int],
                           strides: Sequence[Sequence[int]],
                           ) -> Tuple[List[bool], List[Tuple[int, ...]]]:
    """do_channel_token / feature_map_sizes (UxLSTMEnc_3d.py:168-179):
    a stage tokenizes over channels when its map has <= C voxels."""
    do_channel = []
    sizes = []
    size = tuple(input_size)
    for feats, st in zip(features_per_stage, strides):
        size = tuple(i // j for i, j in zip(size, st))
        sizes.append(size)
        do_channel.append(int(np.prod(size)) <= feats)
    return do_channel, sizes


class ResidualXlstmEncoder(nn.Module):
    """Stem + n_stages of (strided ResBlock + extra blocks) + per-stage mixer
    (conv for stages < vil_start_stage, ViL after)
    (reference ResidualXlstmEncoder, UxLSTMEnc_3d.py:129-317)."""

    input_size: Tuple[int, ...]
    features_per_stage: Tuple[int, ...]
    kernel_sizes: Union[int, Tuple] = 3
    strides: Union[int, Tuple] = 2
    n_blocks_per_stage: Union[int, Tuple[int, ...]] = 1
    use_vil: bool = True      # False -> plain UNetResEncoder (UxLSTMBot)
    chunk_size: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        ndim = len(self.input_size)
        n_stages = len(self.features_per_stage)
        kernels = _stage_kernels(self.kernel_sizes, n_stages, ndim)
        strides = _stage_strides(self.strides, n_stages, ndim)
        n_blocks = _per_stage(self.n_blocks_per_stage, n_stages)
        do_channel, fmap_sizes = channel_token_schedule(
            self.input_size, self.features_per_stage, strides)

        # stem at full resolution (UxLSTMEnc_3d.py:185-214)
        stem_c = self.features_per_stage[0]
        x = ResBlockND(stem_c, kernels[0], 1, use_1x1conv=True,
                       dtype=self.dtype, name="stem_res")(x)
        for b in range(n_blocks[0] - 1):
            x = ResBlockND(stem_c, kernels[0], 1, dtype=self.dtype,
                           name=f"stem_block{b}")(x)

        skips = []
        for s in range(n_stages):
            feats = self.features_per_stage[s]
            x = ResBlockND(feats, kernels[s], strides[s], use_1x1conv=True,
                           dtype=self.dtype, name=f"stage{s}_res")(x)
            for b in range(n_blocks[s] - 1):
                x = ResBlockND(feats, kernels[s], 1, dtype=self.dtype,
                               name=f"stage{s}_block{b}")(x)
            if self.use_vil:
                kind = mixer_schedule(n_stages, ndim)[s]
                if kind == "conv":
                    x = ResBlockND(feats, kernels[s], 1, dtype=self.dtype,
                                   name=f"mixer{s}")(x)
                elif kind == "vil":
                    dim = (int(np.prod(fmap_sizes[s])) if do_channel[s]
                           else feats)
                    x = ViLMixerND(dim, channel_token=do_channel[s],
                                   chunk_size=self.chunk_size,
                                   name=f"mixer{s}")(x)
                # "none": the 2D schedule's nn.Identity
            skips.append(x)
        return skips


class UNetResDecoder(nn.Module):
    """Nearest-upsample (+1x1 conv) / concat-skip / ResBlock decoder with
    optional deep supervision (reference UNetResDecoder,
    UxLSTMEnc_3d.py:320-425). Returns highest-resolution logits first.

    In the reference's 2D files the decoder's LAST (highest-resolution)
    stage does not concatenate the stem skip (UxLSTMEnc_2d.py:375,408 —
    `if s < len(stages)-1: cat`), so the 2D nets ignore skips[0]; matched
    here by spatial rank."""

    num_classes: int
    features_per_stage: Tuple[int, ...]
    kernel_sizes: Union[int, Tuple] = 3
    strides: Union[int, Tuple] = 2
    n_conv_per_stage: Union[int, Tuple[int, ...]] = 1
    deep_supervision: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, skips: Sequence[jnp.ndarray]):
        ndim = skips[0].ndim - 2
        n_stages = len(self.features_per_stage)
        kernels = _stage_kernels(self.kernel_sizes, n_stages, ndim)
        strides = _stage_strides(self.strides, n_stages, ndim)
        n_conv = _per_stage(self.n_conv_per_stage, n_stages - 1)

        x = skips[-1]
        seg_outputs = []
        for s in range(1, n_stages):
            feats_skip = self.features_per_stage[-(s + 1)]
            # UpsampleLayer: nearest interpolate by the encoder stride, 1x1
            # conv to the skip width (UxLSTMEnc_3d.py:23-40,347-353)
            for ax, r in enumerate(strides[-s]):
                if r != 1:
                    x = jnp.repeat(x, r, axis=ax + 1)
            x = nn.Conv(feats_skip, kernel_size=(1,) * ndim, dtype=self.dtype,
                        name=f"up{s}_conv")(x)
            if not (ndim == 2 and s == n_stages - 1):
                x = jnp.concatenate([x, skips[-(s + 1)]], axis=-1)
            x = ResBlockND(feats_skip, kernels[-(s + 1)], 1, use_1x1conv=True,
                           dtype=self.dtype, name=f"dec{s}_res")(x)
            for b in range(n_conv[s - 1] - 1):
                x = ResBlockND(feats_skip, kernels[-(s + 1)], 1,
                               dtype=self.dtype, name=f"dec{s}_block{b}")(x)
            if self.deep_supervision or s == n_stages - 1:
                seg = nn.Conv(self.num_classes, kernel_size=(1,) * ndim,
                              dtype=self.dtype, name=f"seg{s}")(x)
                seg_outputs.append(seg)
        seg_outputs = seg_outputs[::-1]
        return seg_outputs if self.deep_supervision else seg_outputs[0]


def _nnunet_block_caps(n_stages: int, n_blocks, n_dec) -> Tuple[list, list]:
    """nnU-Net's UxLSTM trainers cap deep-stage block counts to 1
    (UxLSTMEnc_3d.py:456-460)."""
    n_blocks = _per_stage(n_blocks, n_stages)
    n_dec = _per_stage(n_dec, n_stages - 1)
    for s in range(math.ceil(n_stages / 2), n_stages):
        n_blocks[s] = 1
    for s in range(math.ceil((n_stages - 1) / 2 + 0.5), n_stages - 1):
        n_dec[s] = 1
    return n_blocks, n_dec


class UXlstmEnc(nn.Module):
    """U-Net with ViL mixers on deep encoder stages (reference UXlstmEnc,
    UxLSTMEnc_3d.py:427-498; 2D twin in UxLSTMEnc_2d.py)."""

    input_size: Tuple[int, ...]
    input_channels: int
    features_per_stage: Tuple[int, ...]
    num_classes: int
    kernel_sizes: Union[int, Tuple] = 3
    strides: Union[int, Tuple] = 2
    n_conv_per_stage: Union[int, Tuple[int, ...]] = 2
    n_conv_per_stage_decoder: Union[int, Tuple[int, ...]] = 2
    deep_supervision: bool = False
    chunk_size: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n_stages = len(self.features_per_stage)
        n_blocks, n_dec = _nnunet_block_caps(
            n_stages, self.n_conv_per_stage, self.n_conv_per_stage_decoder)
        skips = ResidualXlstmEncoder(
            self.input_size, self.features_per_stage, self.kernel_sizes,
            self.strides, tuple(n_blocks), use_vil=True,
            chunk_size=self.chunk_size, dtype=self.dtype, name="encoder")(x)
        return UNetResDecoder(
            self.num_classes, self.features_per_stage, self.kernel_sizes,
            self.strides, tuple(n_dec), self.deep_supervision,
            dtype=self.dtype, name="decoder")(skips)


class UXlstmBot(nn.Module):
    """U-Net with a single ViL layer at the bottleneck (reference UXlstmBot,
    UxLSTMBot_3d.py:360-445; 2D twin in UxLSTMBot_2d.py)."""

    input_size: Tuple[int, ...]
    input_channels: int
    features_per_stage: Tuple[int, ...]
    num_classes: int
    kernel_sizes: Union[int, Tuple] = 3
    strides: Union[int, Tuple] = 2
    n_conv_per_stage: Union[int, Tuple[int, ...]] = 2
    n_conv_per_stage_decoder: Union[int, Tuple[int, ...]] = 2
    deep_supervision: bool = False
    chunk_size: int = 128
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n_stages = len(self.features_per_stage)
        n_blocks, n_dec = _nnunet_block_caps(
            n_stages, self.n_conv_per_stage, self.n_conv_per_stage_decoder)
        skips = ResidualXlstmEncoder(
            self.input_size, self.features_per_stage, self.kernel_sizes,
            self.strides, tuple(n_blocks), use_vil=False,
            dtype=self.dtype, name="encoder")(x)
        # ViL on the bottleneck skip only (UxLSTMBot_3d.py:431,436)
        skips = list(skips)
        skips[-1] = ViLMixerND(self.features_per_stage[-1],
                               chunk_size=self.chunk_size,
                               name="xlstm")(skips[-1])
        return UNetResDecoder(
            self.num_classes, self.features_per_stage, self.kernel_sizes,
            self.strides, tuple(n_dec), self.deep_supervision,
            dtype=self.dtype, name="decoder")(skips)


def build_uxlstm_from_plans(plans: dict,
                            num_input_channels: int,
                            num_classes: int,
                            deep_supervision: bool = True,
                            variant: str = "enc",
                            dtype: Optional[Dtype] = None):
    """nnU-Net plans-dict factory (replaces get_uxlstm_enc_3d_from_plans,
    UxLSTMEnc_3d.py:501-554, without the nnunetv2 dependency).

    `plans` is a plain dict with the ConfigurationManager fields the
    reference factory reads:
      patch_size, conv_kernel_sizes, pool_op_kernel_sizes,
      n_conv_per_stage_encoder, n_conv_per_stage_decoder,
      UNet_base_num_features, unet_max_num_features.
    Spatial rank (2D/3D) follows len(conv_kernel_sizes[0]) exactly like
    convert_dim_to_conv_op in the reference.
    """
    num_stages = len(plans["conv_kernel_sizes"])
    base = plans.get("UNet_base_num_features", 32)
    cap = plans.get("unet_max_num_features", 320)
    features = tuple(min(base * 2 ** i, cap) for i in range(num_stages))
    cls = {"enc": UXlstmEnc, "bot": UXlstmBot}[variant]
    return cls(
        input_size=tuple(plans["patch_size"]),
        input_channels=num_input_channels,
        features_per_stage=features,
        num_classes=num_classes,
        kernel_sizes=tuple(tuple(k) for k in plans["conv_kernel_sizes"]),
        strides=tuple(tuple(s) for s in plans["pool_op_kernel_sizes"]),
        n_conv_per_stage=tuple(plans.get("n_conv_per_stage_encoder",
                                         [2] * num_stages)),
        n_conv_per_stage_decoder=tuple(plans.get(
            "n_conv_per_stage_decoder", [2] * (num_stages - 1))),
        deep_supervision=deep_supervision,
        dtype=dtype,
    )
