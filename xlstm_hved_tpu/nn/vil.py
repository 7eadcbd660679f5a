"""Vision-xLSTM (ViL) token mixer, TPU-native.

Re-designed from the reference's vendored Vision-LSTM subsystem
(/root/reference/UxLSTM/nnunetv2/nets/vision_lstm.py:133-506 and the wrapper
UxLSTMEnc_3d.py:42-87). The quadratic `parallel_stabilized_simple` cell is
replaced by the chunkwise mLSTM scan (ops/mlstm.py) / fused Pallas kernel —
identical math, linear memory in S.

Components:
- LinearHeadwiseExpand: block-diagonal per-head projection (vision_lstm.py:133-176)
- CausalConv1d: depthwise causal conv, left-pad k-1 (:178-221)
- ResidualLayerNorm / MultiHeadLayerNorm: weight = 1 + w ("residual weight"),
  per-head group norm (:224-287)
- MatrixLSTMCell: i/f gates from concat(q,k,v), mLSTM, out-norm (:290-348)
- ViLLayer: up-proj -> (mlstm branch with causal conv + headwise qkv) * SiLU(z)
  -> down-proj, learnable skip (:351-477)
- ViLBlock: pre-LN residual wrapper (:480-506)
- ViLLayer3D: the symbol the HVED model uses — flattens (B,D,H,W,C) to patch
  tokens (row-major DHW, matching the reference flatten at
  UxLSTMEnc_3d.py:54-63) or channel tokens, runs one ViLBlock, reshapes back.
  Runs in fp32 like the reference's @autocast(enabled=False) wrapper.

Init matches the reference's dedicated xLSTM init (small_init / wang_init /
fgate bias linspace 3..6). NOTE: the reference then clobbers part of this via
a global model.apply(init_weights) (/root/reference/train.py:145); we keep the
intended xLSTM init (documented deviation).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_hved_tpu.ops.mlstm import mlstm_chunkwise

Dtype = Any


def small_init(dim: int):
    return nn.initializers.normal(stddev=math.sqrt(2.0 / (5.0 * dim)))


def wang_init(dim: int, num_blocks: int = 1):
    return nn.initializers.normal(stddev=2.0 / num_blocks / math.sqrt(dim))


def bias_linspace_init(start: float = 3.0, end: float = 6.0):
    def init(key, shape, dtype=jnp.float32):
        assert len(shape) == 1
        return jnp.linspace(start, end, shape[0], dtype=dtype)

    return init


class LinearHeadwiseExpand(nn.Module):
    """Block-diagonal projection: per-head (d, d) weight."""

    dim: int
    num_heads: int
    use_bias: bool = False
    init_dim: Optional[int] = None  # reference inits with the *outer* dim
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.dim % self.num_heads == 0
        d = self.dim // self.num_heads
        # The reference re-inits qkv projections with small_init on the OUTER
        # embedding dim (vision_lstm.py:467-475); init_dim carries that.
        std = math.sqrt(2.0 / (5.0 * self.init_dim)) if self.init_dim \
            else math.sqrt(2.0 / 5.0 / d)
        w = self.param(
            "weight", nn.initializers.normal(stddev=std), (self.num_heads, d, d)
        )
        xh = x.reshape(x.shape[:-1] + (self.num_heads, d))
        y = jnp.einsum("...hd,hed->...he", xh,
                       w.astype(self.dtype or x.dtype))
        y = y.reshape(x.shape[:-1] + (self.dim,))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.dim,))
            y = y + b
        return y


class CausalConv1d(nn.Module):
    """Depthwise causal conv over the token axis of (B, S, F)."""

    dim: int
    kernel_size: int = 4
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size - 1
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        y = nn.Conv(
            self.dim,
            kernel_size=(self.kernel_size,),
            padding="VALID",
            feature_group_count=self.dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(xp)
        return y


class ResidualLayerNorm(nn.Module):
    """LayerNorm whose scale is (1 + w), bias optional (off by default)."""

    use_weight: bool = True
    use_bias: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_weight:
            w = self.param("weight", nn.initializers.zeros, (dim,))
            y = y * (1.0 + w)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (dim,))
            y = y + b
        return y.astype(x.dtype)


class MultiHeadLayerNorm(nn.Module):
    """Per-head LayerNorm of (B, NH, S, DH) with channelwise (1+w) scale over
    the flattened NH*DH axis, no bias (reference MultiHeadLayerNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        B, NH, S, DH = x.shape
        w = self.param("weight", nn.initializers.zeros, (NH * DH,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * (1.0 + w).reshape(1, NH, 1, DH)
        return y.astype(x.dtype)


class MatrixLSTMCell(nn.Module):
    """q,k,v -> mLSTM -> per-head out-norm (reference MatrixLSTMCell)."""

    dim: int
    num_heads: int
    chunk_size: int = 128
    # None = auto: fused Pallas kernel on TPU (faster AND closer to the fp64
    # oracle than the XLA scan — see ops/mlstm.py docstring), scan elsewhere.
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, q, k, v):
        B, S, _ = q.shape
        NH = self.num_heads
        DH = self.dim // NH
        gate_in = jnp.concatenate([q, k, v], axis=-1)
        igate = nn.Dense(
            NH, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.normal(stddev=0.1),
            dtype=jnp.float32, name="igate",
        )(gate_in.astype(jnp.float32))
        fgate = nn.Dense(
            NH, kernel_init=nn.initializers.zeros,
            bias_init=bias_linspace_init(3.0, 6.0),
            dtype=jnp.float32, name="fgate",
        )(gate_in.astype(jnp.float32))

        to_heads = lambda t: t.reshape(B, S, NH, DH).transpose(0, 2, 1, 3)
        use_pallas = (jax.default_backend() == "tpu"
                      if self.use_pallas is None else self.use_pallas)
        if use_pallas:
            from xlstm_hved_tpu.ops.mlstm_pallas import mlstm_pallas
            h = mlstm_pallas(
                to_heads(q), to_heads(k), to_heads(v),
                igate.transpose(0, 2, 1), fgate.transpose(0, 2, 1),
                self.chunk_size,
            )
        else:
            h = mlstm_chunkwise(
                to_heads(q), to_heads(k), to_heads(v),
                igate.transpose(0, 2, 1), fgate.transpose(0, 2, 1),
                chunk_size=self.chunk_size,
            )
        h = MultiHeadLayerNorm(name="outnorm")(h)
        return h.transpose(0, 2, 1, 3).reshape(B, S, -1)


class ViLLayer(nn.Module):
    """The mLSTM token mixer (reference ViLLayer, vision_lstm.py:351-477)."""

    dim: int
    reverse: bool = False  # ROWWISE_FROM_BOT_RIGHT when True
    expansion: int = 2
    qkv_block_size: int = 4
    proj_bias: bool = False
    conv_bias: bool = True
    kernel_size: int = 4
    chunk_size: int = 128
    use_pallas: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        qkv_block = self.qkv_block_size if self.dim % self.qkv_block_size == 0 else 2
        inner = self.expansion * self.dim
        num_proj_heads = inner // qkv_block

        if self.reverse:
            x = jnp.flip(x, axis=1)

        x_inner = nn.Dense(2 * inner, use_bias=self.proj_bias,
                           kernel_init=small_init(self.dim),
                           dtype=self.dtype, name="proj_up")(x)
        x_mlstm, z = jnp.split(x_inner, 2, axis=-1)

        x_conv = CausalConv1d(inner, self.kernel_size, self.conv_bias,
                              dtype=self.dtype, name="conv1d")(x_mlstm)
        x_conv_act = nn.silu(x_conv)
        q = LinearHeadwiseExpand(inner, num_proj_heads, self.proj_bias,
                                 init_dim=self.dim, dtype=self.dtype,
                                 name="q_proj")(x_conv_act)
        k = LinearHeadwiseExpand(inner, num_proj_heads, self.proj_bias,
                                 init_dim=self.dim, dtype=self.dtype,
                                 name="k_proj")(x_conv_act)
        v = LinearHeadwiseExpand(inner, num_proj_heads, self.proj_bias,
                                 init_dim=self.dim, dtype=self.dtype,
                                 name="v_proj")(x_mlstm)

        h = MatrixLSTMCell(inner, qkv_block, chunk_size=self.chunk_size,
                           use_pallas=self.use_pallas, dtype=self.dtype,
                           name="mlstm_cell")(q, k, v)
        skip = self.param("learnable_skip", nn.initializers.ones, (inner,))
        h = h.astype(x_conv_act.dtype) + skip * x_conv_act

        h = h * nn.silu(z)
        y = nn.Dense(self.dim, use_bias=self.proj_bias,
                     kernel_init=wang_init(self.dim),
                     dtype=self.dtype, name="proj_down")(h)
        if self.reverse:
            y = jnp.flip(y, axis=1)
        return y


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch (reference DropPath,
    vision_lstm_util.py:132-209). Stochastic only when a "droppath" RNG is
    supplied (training); otherwise the residual is added unscaled, matching
    the reference's eval behavior. Parameter-free."""

    rate: float = 0.0
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, residual):
        if self.rate == 0.0 or not self.has_rng("droppath"):
            return x + residual
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("droppath"), keep, shape)
        if self.scale_by_keep:
            residual = residual / keep
        return x + residual * mask.astype(residual.dtype)


class ViLBlock(nn.Module):
    """Pre-LN residual ViLLayer (reference ViLBlock) with optional stochastic
    depth (drop_path is 0 in every reference use; kept for parity/extension)."""

    dim: int
    reverse: bool = False
    chunk_size: int = 128
    use_pallas: Optional[bool] = None
    drop_path: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = ResidualLayerNorm(name="norm")(x)
        y = ViLLayer(self.dim, reverse=self.reverse, chunk_size=self.chunk_size,
                     use_pallas=self.use_pallas, dtype=self.dtype,
                     name="layer")(y)
        if self.drop_path > 0.0:
            return DropPath(self.drop_path, name="drop_path")(x, y)
        return x + y


class ViLLayer3D(nn.Module):
    """3D-volume wrapper: flatten to tokens, run one forward ViLBlock, reshape
    back (reference UxLSTMEnc_3d.ViLLayer:42-87). Forced fp32 like the
    reference's autocast(enabled=False). The reference defines an unused
    nn.LayerNorm here; we omit it (no parameters, no forward effect)."""

    dim: int
    channel_token: bool = False
    chunk_size: int = 128
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        if self.channel_token:
            # tokens are channels, features are flattened spatial dims
            b = x.shape[0]
            spatial = x.shape[1:4]
            c = x.shape[-1]
            flat = x.reshape(b, -1, c).transpose(0, 2, 1)  # (B, C, S)
            y = ViLBlock(self.dim, chunk_size=self.chunk_size,
                         use_pallas=self.use_pallas, name="vil")(flat)
            y = y.transpose(0, 2, 1).reshape(b, *spatial, c)
        else:
            b = x.shape[0]
            spatial = x.shape[1:4]
            c = x.shape[-1]
            assert c == self.dim
            flat = x.reshape(b, -1, c)  # row-major DHW token order
            y = ViLBlock(self.dim, chunk_size=self.chunk_size,
                         use_pallas=self.use_pallas, name="vil")(flat)
            y = y.reshape(b, *spatial, c)
        return y.astype(orig_dtype)


class DoubleConvViL(nn.Module):
    """DoubleConv + LeakyReLU + ViL (reference DoubleConv_ViL,
    buildingblocks.py:509-555); used in the ViL-decoder zoo variants."""

    features: int
    encoder: bool = False
    kernel_size: int = 3
    pool_stride: int = 1
    order: str = "gcr"
    num_groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from xlstm_hved_tpu.nn.blocks import DoubleConv

        x = DoubleConv(self.features, self.encoder, self.kernel_size,
                       self.pool_stride, self.order, self.num_groups,
                       dtype=self.dtype, name="double_conv")(x, train=train)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = ViLLayer3D(self.features, name="vil")(x)
        return x
