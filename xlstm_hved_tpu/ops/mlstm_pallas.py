"""Fused Pallas TPU kernels for the chunkwise mLSTM (forward AND backward).

Same math as ops/mlstm.py::mlstm_chunkwise (the exact chunk decomposition of
the reference's quadratic stabilized cell, vision_lstm.py:48-130). The gate
transforms (logsigmoid, per-chunk inclusive cumsum A, s = i - A, and the
chunk-local cummax) are precomputed exactly in fp32 by XLA — in-kernel MXU
matmul cumsums lose ~5e-4 which the max(|rowsum|, e^{-m}) normalizer
amplifies. The kernels fuse the intra-chunk quadratic attention, inter-chunk
state propagation, and normalization in VMEM; the carried state lives in
VMEM/SMEM scratch persisting across the sequential chunk grid axis.

Grid: (B*NH, S/L) with the chunk axis minor (sequential); scratch resets at
chunk 0. The backward kernel walks chunks in REVERSE via its BlockSpec index
maps, carrying the (dC, dn, dm) adjoint state.

Backward math (flash-attention-style frozen stabilizers): every max-based
stabilizer (M_t = max(m*, cummax s), M' = max(m*, max s)) cancels exactly in
h — num, rowsum, and e^{-mlog} all scale by e^{-M} and the max() commutes
with positive scaling — so the exact gradient treats them as constants (the
`+ eps` in the denominator breaks this at O(eps); tested below the fp32
noise floor). Real gate gradients flow through three paths only:
  - intra-chunk decay  e^{s_p - M_t}  -> ds_p = colsum(dattn * attn)
  - state-update decay e^{s_p - M'}   -> ds_p from the (dC', dn') adjoints
  - the chunk-boundary offset m*' = A_{L-1} + M' -> the dm adjoint lands on
    dA_{L-1}; the denominator's e^{-(A_t + M_t)} branch lands on dA_t.
dA converts to forget-gate grads by a per-chunk reversed cumsum in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlstm_hved_tpu.ops.mlstm import MLSTM_EPS, _log_sigmoid, mlstm_chunkwise


def _mlstm_kernel(q_ref, k_ref, v_ref, a_ref, s_ref, cm_ref, srow_ref,
                  out_ref, c_state, n_state, m_state, *, eps: float,
                  cent_ref=None, nent_ref=None):
    cidx = pl.program_id(1)

    @pl.when(cidx == 0)
    def _():
        c_state[:] = jnp.zeros_like(c_state)
        n_state[:] = jnp.zeros_like(n_state)
        m_state[0, 0] = jnp.float32(-1e30)

    if cent_ref is not None:
        # chunk-ENTRY state, saved for the backward pass (m is recomputed
        # in XLA from the gates alone, see _m_entry_chain)
        cent_ref[0, 0] = c_state[:]
        nent_ref[0, 0] = n_state[:]

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
    # mask in LOG space before the exp: masked s_j - M_t is unbounded above
    # and the overflowed +inf lanes, while discarded by select here, would
    # poison the backward recomputation (see ops/mlstm.py _chunk_scan_body)
    dec = jnp.exp(jnp.where(causal, s_row - m_local_col, -jnp.inf))

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
    # exponent clamp (match _chunk_scan_body): unclamped e^{-m_t} overflows
    # for m_t < -88 and turns the dead normalizer branch into inf/NaN
    denom = jnp.maximum(jnp.abs(rowsum),
                        jnp.exp(-jnp.maximum(a + m_local_col, -60.0))) + eps
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


def _mlstm_states_kernel(q_ref, k_ref, v_ref, a_ref, s_ref, cm_ref, srow_ref,
                         out_ref, cent_ref, nent_ref, c_state, n_state,
                         m_state, *, eps: float):
    _mlstm_kernel(q_ref, k_ref, v_ref, a_ref, s_ref, cm_ref, srow_ref,
                  out_ref, c_state, n_state, m_state, eps=eps,
                  cent_ref=cent_ref, nent_ref=nent_ref)


def _prep(q, k, v, igate, fgate, chunk_size: int, extra=None):
    """Pad to a chunk multiple and precompute the exact fp32 gate transforms
    (XLA): per-chunk inclusive log-forget cumsum a, s = i - a, local cummax.
    `extra` (e.g. the cotangent) is zero-padded along S."""
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
        if extra is not None:
            extra = jnp.pad(extra, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Sp = S + pad
    nchunks = Sp // L
    BH = B * NH

    f32 = jnp.float32
    lf = _log_sigmoid(fgate.astype(f32)).reshape(BH, nchunks, L)
    ig = igate.astype(f32).reshape(BH, nchunks, L)
    a = jnp.cumsum(lf, axis=-1)
    s = ig - a
    cm = jax.lax.cummax(s, axis=2)
    dims = (B, NH, S, DH, L, Sp, nchunks, BH)
    return q, k, v, extra, a, s, cm, dims


def _specs(L, DH, nchunks, reverse=False):
    """Forward or reversed-chunk BlockSpecs for the (BH, chunks) grid."""
    ix = (lambda b, c, _n=nchunks: (b, _n - 1 - c, 0)) if reverse \
        else (lambda b, c: (b, c, 0))
    ix_row = (lambda b, c, _n=nchunks: (b * _n + (_n - 1 - c), 0, 0)) \
        if reverse else (lambda b, c, _n=nchunks: (b * _n + c, 0, 0))
    qkv = pl.BlockSpec((1, L, DH), ix, memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, L, 1), ix, memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, L), ix_row, memory_space=pltpu.VMEM)
    return qkv, col, row


def _pallas_forward(q, k, v, igate, fgate, chunk_size: int, eps: float,
                    interpret: bool, save_states: bool = False):
    q, k, v, _, a, s, cm, dims = _prep(q, k, v, igate, fgate, chunk_size)
    B, NH, S, DH, L, Sp, nchunks, BH = dims

    qf = q.reshape(BH, Sp, DH)
    kf = k.reshape(BH, Sp, DH)
    vf = v.reshape(BH, Sp, DH)
    col = lambda x: x.reshape(BH, Sp, 1)
    s_row = s.reshape(BH * nchunks, 1, L)

    qkv_spec, col_spec, row_spec = _specs(L, DH, nchunks)
    out_specs = pl.BlockSpec((1, L, DH), lambda b, c: (b, c, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((BH, Sp, DH), jnp.float32)
    if save_states:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, DH, DH), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, DH), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((BH, nchunks, DH, DH), jnp.float32),
            jax.ShapeDtypeStruct((BH, nchunks, 1, DH), jnp.float32),
        ]
    kernel = (functools.partial(_mlstm_states_kernel, eps=eps) if save_states
              else functools.partial(_mlstm_kernel, eps=eps))
    res = pl.pallas_call(
        kernel,
        grid=(BH, nchunks),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, col_spec, col_spec, col_spec,
                  row_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((DH, DH), jnp.float32),
            pltpu.VMEM((1, DH), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, col(a), col(s), col(cm), s_row)
    if save_states:
        out, cent, nent = res
        return out.reshape(B, NH, Sp, DH)[:, :, :S], cent, nent
    return res.reshape(B, NH, Sp, DH)[:, :, :S]


def _mlstm_bwd_kernel(q_ref, k_ref, v_ref, g_ref, a_ref, s_ref, cm_ref,
                      srow_ref, cent_ref, nent_ref, ment_ref,
                      dq_ref, dk_ref, dv_ref, ds_ref, dax_ref,
                      dc_state, dn_state, dm_state, *, eps: float):
    """Reverse-chunk adjoint pass. Stabilizers (every max()) are treated as
    constants — exact, see module docstring. Carries (dC, dn, dm): the
    adjoints of the chunk-entry state (C*, n*, m*)."""
    ridx = pl.program_id(1)

    @pl.when(ridx == 0)
    def _():
        dc_state[:] = jnp.zeros_like(dc_state)
        dn_state[:] = jnp.zeros_like(dn_state)
        dm_state[0, 0] = jnp.float32(0.0)

    f32 = jnp.float32
    q = q_ref[0].astype(f32)            # (L, DH)
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    g = g_ref[0].astype(f32)            # cotangent dL/dh
    a = a_ref[0]                        # (L, 1)
    s = s_ref[0]                        # (L, 1)
    cm = cm_ref[0]                      # (L, 1)
    s_row = srow_ref[0]                 # (1, L)
    c_in = cent_ref[0, 0]               # (DH, DH) chunk-entry state
    n_in = nent_ref[0, 0]               # (1, DH)
    m_in = ment_ref[0, 0, 0]            # scalar (broadcast col, see driver)
    dc_in = dc_state[:]
    dn_in = dn_state[:]
    dm_in = dm_state[0, 0]

    L, DH = q.shape
    scale = 1.0 / jnp.sqrt(f32(DH))
    hi = jax.lax.Precision.HIGHEST
    dot = functools.partial(jnp.dot, preferred_element_type=f32, precision=hi)
    qs = q * scale

    # ---- recompute the forward readout quantities ----
    m_col = jnp.maximum(cm, m_in)       # (L, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    causal = col_ids <= row_ids
    # log-space mask + clamped normalizer exponent: MUST mirror the forward
    # kernel exactly so act/denom recompute consistently (see fwd kernel)
    dec = jnp.exp(jnp.where(causal, s_row - m_col, -jnp.inf))
    qk = dot(qs, k.T)
    attn = qk * dec
    inter = jnp.exp(m_in - m_col)       # (L, 1)
    qC = dot(qs, c_in)                  # (L, DH)
    qn = dot(qs, n_in.reshape(DH, 1))   # (L, 1)
    num = dot(attn, v) + inter * qC
    rowsum = jnp.sum(attn, axis=1, keepdims=True) + inter * qn
    mlog = a + m_col
    e_neg = jnp.exp(-jnp.maximum(mlog, -60.0))
    denom = jnp.maximum(jnp.abs(rowsum), e_neg) + eps
    act = jnp.abs(rowsum) >= e_neg      # (L, 1) live |rowsum| branch

    # ---- readout backward ----
    g_over = g / denom                                        # d num
    ddenom = -jnp.sum(g * num, axis=1, keepdims=True) / (denom * denom)
    drow = jnp.where(act, jnp.sign(rowsum) * ddenom, 0.0)     # d rowsum
    # e^{-(A_t + M_t)} branch: the A_t part is the real gradient (the M_t
    # part cancels against the frozen e^{-M} factors in num/rowsum)
    dax = jnp.where(act, 0.0, -e_neg * ddenom)                # (L, 1)
    # m*' = A_{L-1} + M': the incoming boundary adjoint lands on A_{L-1}
    is_last = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) == L - 1
    dax = dax + jnp.where(is_last, dm_in, 0.0)

    dattn = dot(g_over, v.T) + drow                           # (L, L)
    dqk = dattn * dec
    dqs = dot(dqk, k) + inter * (dot(g_over, c_in.T) + drow * n_in)
    dk_i = dot(dqk.T, qs)
    dv_i = dot(attn.T, g_over)
    dinter = jnp.sum(qC * g_over, axis=1, keepdims=True) + drow * qn
    dm_read = jnp.sum(dinter * inter)
    dc_read = dot((qs * inter).T, g_over)                     # (DH, DH)
    dn_read = jnp.sum(inter * drow * qs, axis=0, keepdims=True)
    # ds_p(intra) = sum_t dattn*attn over rows, as a column via the MXU
    ds_intra = dot((dattn * attn).T, jnp.ones((L, 1), f32))   # (L, 1)

    # ---- state-update backward (adjoints of C*' -> C*, k, v, s) ----
    m_new = jnp.maximum(m_in, jnp.max(s))
    w = jnp.exp(s - m_new)                                    # (L, 1)
    e_dec = jnp.exp(m_in - m_new)
    vdc = dot(v, dc_in.T)                                     # (L, DH)
    dk_s = w * (vdc + dn_in)                                  # (L, DH)
    dv_s = w * dot(k, dc_in)
    ds_state = w * (jnp.sum(k * vdc, axis=1, keepdims=True)
                    + dot(k, dn_in.reshape(DH, 1)))
    dm_dec = e_dec * (jnp.sum(dc_in * c_in) + jnp.sum(dn_in * n_in))

    ds_total = ds_intra + ds_state
    dq_ref[0] = (scale * dqs).astype(dq_ref.dtype)
    dk_ref[0] = (dk_i + dk_s).astype(dk_ref.dtype)
    dv_ref[0] = (dv_i + dv_s).astype(dv_ref.dtype)
    ds_ref[0] = ds_total
    dax_ref[0] = dax
    dc_state[:] = e_dec * dc_in + dc_read
    dn_state[:] = e_dec * dn_in + dn_read
    dm_state[0, 0] = dm_dec + dm_read


def _m_entry_chain(a, s):
    """Chunk-entry stabilizer offsets m*_c from the gates alone:
    m*_0 = -1e30; m*_{c+1} = a[c, L-1] + max(m*_c, max_p s[c, p]).
    a, s: (BH, nchunks, L) -> (BH, nchunks) f32."""
    a_last = a[:, :, -1]
    s_max = jnp.max(s, axis=-1)

    def step(m, inp):
        al, sm = inp
        m_next = al + jnp.maximum(m, sm)
        return m_next, m

    _, m_ent = jax.lax.scan(
        step, jnp.full((a.shape[0],), -1e30, jnp.float32),
        (a_last.T, s_max.T))
    return m_ent.T  # (BH, nchunks)


def _pallas_backward(q, k, v, igate, fgate, g, chunk_size: int, eps: float,
                     interpret: bool):
    orig_dtypes = (q.dtype, k.dtype, v.dtype, igate.dtype, fgate.dtype)
    # states-saving forward recompute (cheaper than storing h: the kernel is
    # HBM-bound on q/k/v either way and the states are nchunks*(DH^2+DH))
    _, cent, nent = _pallas_forward(q, k, v, igate, fgate, chunk_size, eps,
                                    interpret, save_states=True)
    qp, kp, vp, gp, a, s, cm, dims = _prep(q, k, v, igate, fgate, chunk_size,
                                           extra=g)
    B, NH, S, DH, L, Sp, nchunks, BH = dims
    m_ent = _m_entry_chain(a, s)

    qf = qp.reshape(BH, Sp, DH)
    kf = kp.reshape(BH, Sp, DH)
    vf = vp.reshape(BH, Sp, DH)
    gf = gp.reshape(BH, Sp, DH).astype(jnp.float32)
    col = lambda x: x.reshape(BH, Sp, 1)
    s_row = s.reshape(BH * nchunks, 1, L)

    qkv_spec, col_spec, row_spec = _specs(L, DH, nchunks, reverse=True)
    rix2 = lambda b, c, _n=nchunks: (b, _n - 1 - c, 0, 0)
    cent_spec = pl.BlockSpec((1, 1, DH, DH), rix2, memory_space=pltpu.VMEM)
    nent_spec = pl.BlockSpec((1, 1, 1, DH), rix2, memory_space=pltpu.VMEM)
    # m* per chunk, broadcast over L as a VMEM column — a (1, 1) SMEM block
    # is not lowerable on real TPUs (mosaic requires the last two block dims
    # divisible by (8, 128) or equal to the array's)
    m_col = jnp.repeat(m_ent[:, :, None], L, axis=2).reshape(BH, Sp, 1)
    f32 = jnp.float32
    dq, dk, dv, ds, dax = pl.pallas_call(
        functools.partial(_mlstm_bwd_kernel, eps=eps),
        grid=(BH, nchunks),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec, col_spec, col_spec,
                  col_spec, row_spec, cent_spec, nent_spec, col_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sp, DH), f32),
            jax.ShapeDtypeStruct((BH, Sp, DH), f32),
            jax.ShapeDtypeStruct((BH, Sp, DH), f32),
            jax.ShapeDtypeStruct((BH, Sp, 1), f32),
            jax.ShapeDtypeStruct((BH, Sp, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((DH, DH), f32),
            pltpu.VMEM((1, DH), f32),
            pltpu.SMEM((1, 1), f32),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf, col(a), col(s), col(cm), s_row, cent, nent, m_col)

    # gate epilogue (XLA): di = ds; dA = dax - ds (s_p = i_p - A_p);
    # A = cumsum(lf) => dlf = reversed inclusive cumsum of dA per chunk;
    # d logsigmoid(f) = sigmoid(-f)
    ds_c = ds.reshape(BH, nchunks, L)
    dA = dax.reshape(BH, nchunks, L) - ds_c
    dlf = jnp.flip(jnp.cumsum(jnp.flip(dA, -1), axis=-1), -1)
    fpad = (-S) % L
    fg = jnp.pad(fgate, ((0, 0), (0, 0), (0, fpad)), constant_values=1e30) \
        if fpad else fgate
    dfg = dlf * jax.nn.sigmoid(-fg.astype(f32).reshape(BH, nchunks, L))

    unpadded = lambda x: x.reshape(B, NH, Sp, DH)[:, :, :S]
    gates = lambda x: x.reshape(B, NH, Sp)[:, :, :S]
    return (unpadded(dq).astype(orig_dtypes[0]),
            unpadded(dk).astype(orig_dtypes[1]),
            unpadded(dv).astype(orig_dtypes[2]),
            gates(ds_c).astype(orig_dtypes[3]),
            gates(dfg).astype(orig_dtypes[4]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def mlstm_pallas(q, k, v, igate, fgate, chunk_size: int = 128,
                 eps: float = MLSTM_EPS, interpret: bool = False,
                 bwd_mode: str = "fused"):
    """Fused forward; backward is the fused reverse-chunk kernel
    (bwd_mode="fused") or recompute through the JAX chunkwise scan
    (bwd_mode="scan", the pre-r3 behavior kept as a fallback/oracle)."""
    return _pallas_forward(q, k, v, igate, fgate, chunk_size, eps, interpret)


def _fwd(q, k, v, igate, fgate, chunk_size, eps, interpret, bwd_mode):
    out = _pallas_forward(q, k, v, igate, fgate, chunk_size, eps, interpret)
    return out, (q, k, v, igate, fgate)


def _bwd(chunk_size, eps, interpret, bwd_mode, residuals, g):
    q, k, v, igate, fgate = residuals
    if bwd_mode == "fused":
        return _pallas_backward(q, k, v, igate, fgate, g, chunk_size, eps,
                                interpret)
    _, vjp = jax.vjp(
        lambda *args: mlstm_chunkwise(*args, chunk_size=chunk_size, eps=eps),
        q, k, v, igate, fgate)
    return vjp(g)


mlstm_pallas.defvjp(_fwd, _bwd)
