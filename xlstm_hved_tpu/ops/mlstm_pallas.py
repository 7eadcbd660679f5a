"""Fused Pallas TPU kernel for the chunkwise mLSTM.

Same math as ops/mlstm.py::mlstm_chunkwise (the exact chunk decomposition of
the reference's quadratic stabilized cell, vision_lstm.py:48-130). The gate
transforms (logsigmoid, per-chunk inclusive cumsum A, s = i - A, and the
chunk-local cummax) are precomputed exactly in fp32 by XLA — in-kernel MXU
matmul cumsums lose ~5e-4 which the max(|rowsum|, e^{-m}) normalizer
amplifies. The kernel fuses the intra-chunk quadratic attention, inter-chunk
state propagation, and normalization in VMEM; the carried (C, n, m) state
lives in VMEM/SMEM scratch persisting across the sequential chunk grid axis.

Grid: (B*NH, S/L) with the chunk axis minor (sequential); scratch resets at
chunk 0.

Backward: custom VJP recomputing through the differentiable JAX chunkwise
scan — the kernel is the inference/forward fast path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_hved_tpu.ops.mlstm import MLSTM_EPS, _log_sigmoid, mlstm_chunkwise


def _mlstm_kernel(q_ref, k_ref, v_ref, a_ref, s_ref, cm_ref, srow_ref,
                  out_ref, c_state, n_state, m_state, *, eps: float):
    cidx = pl.program_id(1)

    @pl.when(cidx == 0)
    def _():
        c_state[:] = jnp.zeros_like(c_state)
        n_state[:] = jnp.zeros_like(n_state)
        m_state[0, 0] = jnp.float32(-1e30)

    q = q_ref[0].astype(jnp.float32)    # (L, DH)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    a = a_ref[0]                        # (L, 1) inclusive log-forget cumsum
    s = s_ref[0]                        # (L, 1) i - a
    cm = cm_ref[0]                      # (L, 1) local cummax of s
    s_row = srow_ref[0]                 # (1, L) row-layout copy of s

    L, DH = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(DH))
    m_in = m_state[0, 0]
    m_local_col = jnp.maximum(cm, m_in)  # (L, 1)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = col_ids <= row_ids
    dec = jnp.where(causal, jnp.exp(s_row - m_local_col), 0.0)

    qs = q * scale
    hi = jax.lax.Precision.HIGHEST  # cell math is fp32 in the reference
    qk = jnp.dot(qs, k.T, preferred_element_type=jnp.float32, precision=hi)
    attn = qk * dec

    inter_w = jnp.exp(m_in - m_local_col)                # (L, 1)
    num = jnp.dot(attn, v, preferred_element_type=jnp.float32, precision=hi) \
        + inter_w * jnp.dot(qs, c_state[:], preferred_element_type=jnp.float32,
                            precision=hi)
    rowsum = jnp.sum(attn, axis=1, keepdims=True) \
        + inter_w * jnp.dot(qs, n_state[:].reshape(DH, 1),
                            preferred_element_type=jnp.float32, precision=hi)
    denom = jnp.maximum(jnp.abs(rowsum), jnp.exp(-(a + m_local_col))) + eps
    out_ref[0] = (num / denom).astype(out_ref.dtype)

    # state update to the end of this chunk
    m_new = jnp.maximum(m_in, jnp.max(s))
    kv_w = jnp.exp(s - m_new)           # (L, 1)
    decay_old = jnp.exp(m_in - m_new)
    c_state[:] = decay_old * c_state[:] + jnp.dot(
        (k * kv_w).T, v, preferred_element_type=jnp.float32, precision=hi)
    n_state[:] = decay_old * n_state[:] + jnp.sum(k * kv_w, axis=0,
                                                  keepdims=True)
    m_state[0, 0] = a[L - 1, 0] + m_new


def _pallas_forward(q, k, v, igate, fgate, chunk_size: int, eps: float,
                    interpret: bool):
    B, NH, S, DH = q.shape
    L = min(chunk_size, S)
    pad = (-S) % L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        igate = jnp.pad(igate, ((0, 0), (0, 0), (0, pad)),
                        constant_values=-1e30)
        fgate = jnp.pad(fgate, ((0, 0), (0, 0), (0, pad)),
                        constant_values=1e30)
    Sp = S + pad
    nchunks = Sp // L
    BH = B * NH

    # exact fp32 gate precompute (XLA): per-chunk cumsum/cummax
    f32 = jnp.float32
    lf = _log_sigmoid(fgate.astype(f32)).reshape(BH, nchunks, L)
    ig = igate.astype(f32).reshape(BH, nchunks, L)
    a = jnp.cumsum(lf, axis=-1)
    s = ig - a
    cm = jax.lax.cummax(s, axis=2)

    qf = q.reshape(BH, Sp, DH)
    kf = k.reshape(BH, Sp, DH)
    vf = v.reshape(BH, Sp, DH)
    col = lambda x: x.reshape(BH, Sp, 1)
    s_row = s.reshape(BH * nchunks, 1, L)

    qkv_spec = pl.BlockSpec((1, L, DH), lambda b, c: (b, c, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, L, 1), lambda b, c: (b, c, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, L),
                            lambda b, c, _n=nchunks: (b * _n + c, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlstm_kernel, eps=eps),
        grid=(BH, nchunks),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, col_spec, col_spec, col_spec,
                  row_spec],
        out_specs=pl.BlockSpec((1, L, DH), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Sp, DH), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((DH, DH), jnp.float32),
            pltpu.VMEM((1, DH), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, col(a), col(s), col(cm), s_row)
    return out.reshape(B, NH, Sp, DH)[:, :, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def mlstm_pallas(q, k, v, igate, fgate, chunk_size: int = 128,
                 eps: float = MLSTM_EPS, interpret: bool = False):
    """Fused forward; differentiable via recompute-with-scan VJP."""
    return _pallas_forward(q, k, v, igate, fgate, chunk_size, eps, interpret)


def _fwd(q, k, v, igate, fgate, chunk_size, eps, interpret):
    out = _pallas_forward(q, k, v, igate, fgate, chunk_size, eps, interpret)
    return out, (q, k, v, igate, fgate)


def _bwd(chunk_size, eps, interpret, residuals, g):
    q, k, v, igate, fgate = residuals
    _, vjp = jax.vjp(
        lambda *args: mlstm_chunkwise(*args, chunk_size=chunk_size, eps=eps),
        q, k, v, igate, fgate)
    return vjp(g)


mlstm_pallas.defvjp(_fwd, _bwd)
