"""Core conv building blocks (flax.linen, channels-last NDHWC).

TPU-native re-design of /root/reference/buildingblocks.py:381-787:
- the layer-order-string conv factory ('ilc' = InstanceNorm + LeakyReLU +
  Conv, etc. — create_conv, buildingblocks.py:381-437),
- SingleConv / DoubleConv / DoubleConv_ViL / ExtResNetBlock (:440-604),
- Encoder (pool + basic module, :607-659), Decoder with RSM attention
  (:662-734) and trilinear Upsampling (:737-787).

Differences from the reference (intentional, TPU-first):
- channels-last layout; convs lower onto the MXU without layout transposes.
- InstanceNorm is stateless (torch InstanceNorm3d(affine=False) equivalent)
  with fp32 statistics under bf16 compute.
- Upsampling always uses jax.image trilinear resize (the reference's
  transposed-conv branch is likewise replaced by conv1x1 + interpolation,
  buildingblocks.py:759-768).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel normalization over spatial dims (no affine),
    matching torch InstanceNorm3d defaults. Stats in fp32."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(orig_dtype)


def leaky_relu(x, negative_slope=1e-2):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def resize_trilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Trilinear resize of (B, D, H, W, C) to spatial `size` (D', H', W'),
    equivalent to F.interpolate(mode='trilinear', align_corners=False)."""
    b, _, _, _, c = x.shape
    out_shape = (b, *size, c)
    if x.shape == out_shape:
        return x
    return jax.image.resize(x, out_shape, method="trilinear").astype(x.dtype)


def max_pool3d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    w = (window,) * 3
    return nn.max_pool(x, window_shape=w, strides=w)


def avg_pool3d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    w = (window,) * 3
    return nn.avg_pool(x, window_shape=w, strides=w)


class SingleConv(nn.Module):
    """One conv layer with norm/nonlinearity placement driven by the order
    string (reference create_conv/SingleConv, buildingblocks.py:381-461).

    Supported chars: c(conv) r(ReLU) l(LeakyReLU 1e-2) e(ELU)
    i(InstanceNorm) g(GroupNorm) b(BatchNorm). Bias only without g/b norm.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    order: str = "gcr"
    num_groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert "c" in self.order, "conv must be present in layer order"
        bias = not ("g" in self.order or "b" in self.order)
        for char in self.order:
            if char == "c":
                x = nn.Conv(
                    self.features,
                    kernel_size=(self.kernel_size,) * 3,
                    strides=(self.stride,) * 3,
                    padding="SAME",
                    use_bias=bias,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                )(x)
            elif char == "i":
                x = instance_norm(x)
            elif char == "l":
                x = leaky_relu(x)
            elif char == "r":
                x = nn.relu(x)
            elif char == "e":
                x = nn.elu(x)
            elif char == "g":
                ch = x.shape[-1]
                groups = self.num_groups if ch >= self.num_groups else 1
                x = nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)
            elif char == "b":
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            else:
                raise ValueError(f"unsupported layer-order char {char!r}")
        return x


class DoubleConv(nn.Module):
    """Two consecutive SingleConvs with the reference's channel plan
    (buildingblocks.py:464-507): encoder path widens in conv2; decoder path
    narrows in conv1."""

    features: int
    encoder: bool = False
    kernel_size: int = 3
    pool_stride: int = 1
    order: str = "gcr"
    num_groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        if self.encoder:
            mid = max(self.features // 2, in_ch)
        else:
            mid = self.features
        x = SingleConv(mid, self.kernel_size, 1, self.order, self.num_groups,
                       dtype=self.dtype, name="conv1")(x, train=train)
        x = SingleConv(self.features, self.kernel_size, self.pool_stride,
                       self.order, self.num_groups, dtype=self.dtype,
                       name="conv2")(x, train=train)
        return x


class ExtResNetBlock(nn.Module):
    """SingleConv + residual SingleConv (buildingblocks.py:558-604)."""

    features: int
    encoder: bool = False  # unused; kept for a uniform basic-module signature
    kernel_size: int = 3
    pool_stride: int = 1
    order: str = "cge"
    num_groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = SingleConv(self.features, self.kernel_size, 1, self.order,
                         self.num_groups, dtype=self.dtype, name="conv1")(x, train=train)
        residual = out
        out = SingleConv(self.features, self.kernel_size, self.pool_stride,
                         self.order, self.num_groups, dtype=self.dtype,
                         name="conv2")(out, train=train)
        return out + residual


class BasicConv(nn.Module):
    """Conv + optional InstanceNorm + optional LeakyReLU, bias-free by default
    (reference BasicConv, buildingblocks.py:13-31)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    relu: bool = True
    norm: bool = True
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,) * 3,
            strides=(self.stride,) * 3,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        if self.norm:
            x = instance_norm(x)
        if self.relu:
            x = leaky_relu(x)
        return x


class EncoderStage(nn.Module):
    """Optional pooling + N basic modules (reference Encoder,
    buildingblocks.py:607-659)."""

    features: int
    num_block: int = 1
    apply_pooling: bool = True
    pool_type: str = "max"
    basic_module: str = "double_conv"  # double_conv | ext_resnet | double_conv_vil
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.apply_pooling:
            if self.pool_type == "max":
                x = max_pool3d(x)
            elif self.pool_type == "avg":
                x = avg_pool3d(x)
            else:
                x = nn.Conv(self.features, (3, 3, 3), strides=(2, 2, 2),
                            padding="SAME", dtype=self.dtype)(x)
        module = make_basic_module(self.basic_module)
        for i in range(self.num_block):
            x = module(
                features=self.features, encoder=True,
                kernel_size=self.kernel_size, order=self.order,
                num_groups=self.num_groups, dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
        return x


def make_basic_module(name: str) -> Callable[..., nn.Module]:
    from xlstm_hved_tpu.nn.vil import DoubleConvViL  # local import: avoid cycle

    return {
        "double_conv": DoubleConv,
        "ext_resnet": ExtResNetBlock,
        "double_conv_vil": DoubleConvViL,
    }[name]


class ChannelPool(nn.Module):
    """concat(max, mean) over channels -> 2 channels
    (buildingblocks.py:136-138)."""

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([mx, mn], axis=-1)


class AttenModule2(nn.Module):
    """ROI-attentive skip fusion for the U-HVED (MVAE) decoder path
    (reference AttenModule2, buildingblocks.py:259-301).

    seg branch gets a (1 + sigmoid) self-gate from its own channel pool;
    enc branch gets a sigmoid cross-gate from [seg_pool, enc_pool]; output is
    their channel concat.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, seg_x, enc_x):
        pool = ChannelPool()
        expan = 4
        spa_comp = pool(seg_x)  # (B, ..., 2)

        enc_spa = jnp.concatenate([spa_comp, pool(enc_x)], axis=-1)  # 4 ch
        enc_scale = nn.Conv(expan * 4, (7, 7, 7), padding="SAME",
                            feature_group_count=4, dtype=self.dtype,
                            name="enc_spatial")(enc_spa)
        enc_scale = nn.Conv(1, (1, 1, 1), dtype=self.dtype,
                            name="enc_spatial2")(enc_scale)
        enc_scale = nn.sigmoid(enc_scale)
        s_enc_x = enc_x + enc_x * enc_scale

        seg_scale = nn.Conv(expan * 2, (7, 7, 7), padding="SAME",
                            feature_group_count=2, dtype=self.dtype,
                            name="seg_spatial")(spa_comp)
        seg_scale = nn.Conv(1, (1, 1, 1), dtype=self.dtype,
                            name="seg_spatial2")(seg_scale)
        seg_scale = nn.sigmoid(seg_scale)
        scaled_seg_x = seg_x * (1.0 + seg_scale)

        return jnp.concatenate([scaled_seg_x, s_enc_x], axis=-1)


class AttenModule(nn.Module):
    """Full RSM attention joining seg/enc/recon feature groups (reference
    AttenModule, buildingblocks.py:188-257). Used by the non-MVAE decoder."""

    features: int  # per-branch channel count at this level
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, seg_x, enc_x: Sequence[jnp.ndarray],
                 recon_x: Sequence[jnp.ndarray]):
        pool = ChannelPool()
        expan = 4
        spa_comp = pool(seg_x)

        recon_spa = jnp.concatenate([spa_comp] + [pool(r) for r in recon_x], axis=-1)
        rec_scale = nn.Conv(expan * 2 * 5, (7, 7, 7), padding="SAME",
                            feature_group_count=2 * 5, dtype=self.dtype,
                            name="recon_spatial")(recon_spa)
        rec_scale = nn.Conv(4, (1, 1, 1), dtype=self.dtype,
                            name="recon_spatial2")(rec_scale)
        rec_scale = nn.sigmoid(rec_scale)
        s_recon = [r + r * rec_scale[..., i:i + 1] for i, r in enumerate(recon_x)]
        s_recon = jnp.concatenate(s_recon, axis=-1)
        comp_x = BasicConv(self.features, 1, dtype=self.dtype,
                           name="input_comp")(s_recon)

        enc_spa = jnp.concatenate([spa_comp] + [pool(e) for e in enc_x], axis=-1)
        enc_scale = nn.Conv(expan * 2 * 5, (7, 7, 7), padding="SAME",
                            feature_group_count=2 * 5, dtype=self.dtype,
                            name="enc_spatial")(enc_spa)
        enc_scale = nn.Conv(4, (1, 1, 1), dtype=self.dtype,
                            name="enc_spatial2")(enc_scale)
        enc_scale = nn.sigmoid(enc_scale)
        s_enc = [e + e * enc_scale[..., i:i + 1] for i, e in enumerate(enc_x)]
        s_enc = jnp.concatenate(s_enc, axis=-1)

        scaled_recon_x = comp_x + s_enc

        seg_scale = nn.Conv(expan * 2, (7, 7, 7), padding="SAME",
                            feature_group_count=2, dtype=self.dtype,
                            name="seg_spatial")(spa_comp)
        seg_scale = nn.Conv(1, (1, 1, 1), dtype=self.dtype,
                            name="seg_spatial2")(seg_scale)
        seg_scale = nn.sigmoid(seg_scale)
        scaled_seg_x = seg_x * (1.0 + seg_scale)

        return jnp.concatenate([scaled_seg_x, scaled_recon_x], axis=-1)


class DecoderStage(nn.Module):
    """Trilinear upsample to the skip's spatial size + (RSM attention | concat
    | sum) joining + basic module (reference Decoder, buildingblocks.py:662-734).
    """

    features: int
    basic_module: str = "double_conv"
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8
    rsm: bool = False
    mvae: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, encoder_features, x, up_size=None, *, train: bool = False):
        transposed = self.basic_module == "ext_resnet"
        if transposed:
            # reference's ResNet path: conv1x1 to target channels + interp,
            # then summation joining (buildingblocks.py:692-698, 759-763)
            x = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype,
                        name="pre_conv")(x)
        if encoder_features is not None:
            ef = encoder_features[0] if isinstance(encoder_features, (list, tuple)) \
                else encoder_features
            target = ef.shape[1:4]
        else:
            target = up_size
        x = resize_trilinear(x, target)

        if self.rsm:
            if self.mvae:
                x = AttenModule2(dtype=self.dtype, name="atten")(x, encoder_features)
            else:
                raise NotImplementedError(
                    "non-MVAE AttenModule joining is wired in models/hved.py")
        elif encoder_features is not None:
            if transposed:
                x = encoder_features + x
            else:
                feats = encoder_features if isinstance(encoder_features, (list, tuple)) \
                    else [encoder_features]
                x = jnp.concatenate(list(feats) + [x], axis=-1)

        module = make_basic_module(self.basic_module)
        x = module(features=self.features, encoder=False,
                   kernel_size=self.kernel_size, order=self.order,
                   num_groups=self.num_groups, dtype=self.dtype,
                   name="basic")(x, train=train)
        return x
