"""mLSTM cell — quadratic oracle and chunkwise (linear-in-S) scan.

The reference's hottest kernel is `parallel_stabilized_simple`
(/root/reference/UxLSTM/nnunetv2/nets/vision_lstm.py:48-130): an O(S^2)
materialized-matrix form of the mLSTM that builds an (S, S) log-decay matrix
per head. At the flagship's bottleneck S = 6144 this materializes ~600 MB of
intermediates. Because the mLSTM is a linear recurrence, the same math
decomposes exactly into a chunkwise parallel scan: quadratic only within an
L-sized chunk, with an (DH x DH) state + (DH,) normalizer + scalar max-tracker
carried across chunks. That is the TPU-native formulation implemented here
(`mlstm_chunkwise`) and in the fused Pallas kernel (ops/mlstm_pallas.py).

Math (deriving the exact reference semantics, 0-indexed positions):
    lf_t  = logsigmoid(fgate_preact_t)
    logw(t, j) = sum_{u=j+1..t} lf_u + i_j          (j <= t)
    m_t   = max_{j<=t} logw(t, j)                    (rowwise stabilizer)
    C(t, j) = exp(logw(t, j) - m_t) * (q_t . k_j) / sqrt(DH)
    h_t   = sum_j C(t, j) v_j / (max(|sum_j C(t, j)|, exp(-m_t)) + eps)

Chunk decomposition with local log-forget cumsum A_p (inclusive) and
s_p = i_p - A_p:
    carried state after chunk c:  m*, C* = sum_j e^{w_j - m*} k_j v_j^T,
                                  n* = sum_j e^{w_j - m*} k_j
    row t (local p):  M_p = max(m*, cummax_{p'<=p} s_{p'}),  m_t = A_p + M_p
        num_t   = e^{m* - M_p} (q_t/sqrt(DH)) C*  + sum_{p'<=p} e^{s_{p'} - M_p} attn(t,p') v_{p'}
        rowsum_t= e^{m* - M_p} (q_t . n*)/sqrt(DH) + sum_{p'<=p} e^{s_{p'} - M_p} attn(t,p')
    state update:  M' = max(m*, max_p s_p);  m*' = A_{L-1} + M'
        C*' = e^{m* - M'} C* + sum_p e^{s_p - M'} k_p v_p^T   (n*' likewise)

All gate/stabilizer math is fp32; q/k/v matmuls run at HIGHEST precision
(true fp32 on the MXU). This is load-bearing, not defensive: at the TPU
default precision the MXU truncates matmul inputs to bf16 and the
max(|rowsum|, e^{-m}) normalizer amplifies that to O(1) output error
(measured 0.82 at S=6144 vs 3.6e-5 with HIGHEST), while costing nothing
here — the DH=16 matmuls are overhead-bound, not MXU-bound (0.65 ms vs
0.74 ms at S=6144). The reference runs the cell in fp32 under AMP
(UxLSTMEnc_3d.py:77-87).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MLSTM_EPS = 1e-6
_HI = jax.lax.Precision.HIGHEST


def _log_sigmoid(x):
    return -jax.nn.softplus(-x)


def mlstm_quadratic(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    igate: jnp.ndarray,
    fgate: jnp.ndarray,
    eps: float = MLSTM_EPS,
) -> jnp.ndarray:
    """O(S^2) reference form (test oracle; fine for small S).

    Args:
        q, k, v: (B, NH, S, DH)
        igate, fgate: (B, NH, S) gate pre-activations.
    Returns:
        (B, NH, S, DH) h_tilde.
    """
    B, NH, S, DH = q.shape
    dtype = jnp.float32
    q, k, v = q.astype(dtype), k.astype(dtype), v.astype(dtype)
    lf = _log_sigmoid(fgate.astype(dtype))  # (B, NH, S)
    csum = jnp.cumsum(lf, axis=-1)  # inclusive
    # logw(t, j) = csum[t] - csum[j] + i[j] for j <= t
    logw = csum[..., :, None] - csum[..., None, :] + igate.astype(dtype)[..., None, :]
    ltr = jnp.tril(jnp.ones((S, S), dtype=bool))
    logw = jnp.where(ltr, logw, -jnp.inf)
    max_log = jnp.max(logw, axis=-1, keepdims=True)  # (B, NH, S, 1)
    d_mat = jnp.exp(logw - max_log)
    qk = jnp.einsum("bhsd,bhtd->bhst", q, k / jnp.sqrt(DH), precision=_HI)
    c_mat = qk * d_mat
    rowsum = jnp.sum(c_mat, axis=-1, keepdims=True)
    normalizer = jnp.maximum(jnp.abs(rowsum), jnp.exp(-max_log)) + eps
    return jnp.einsum("bhst,bhtd->bhsd", c_mat / normalizer, v, precision=_HI)


def _chunk_scan_body(carry, inp, *, eps: float):
    """Per-chunk body: quadratic intra-chunk + carried-state inter-chunk."""
    c_state, n_state, m_state = carry  # (DH, DH), (DH,), ()
    q, k, v, igate, lf = inp  # (L, DH), (L, DH), (L, DH), (L,), (L,)
    L, DH = q.shape
    scale = 1.0 / jnp.sqrt(DH)

    a = jnp.cumsum(lf)  # (L,) inclusive local log-forget cumsum
    s = igate - a  # (L,)
    m_local = jnp.maximum(jnp.maximum.accumulate(s), m_state)  # (L,) = M_p
    # Intra-chunk decay matrix: exp(s_j - M_t), causal. The causal mask MUST
    # be applied in LOG space, before the exp (as the quadratic form and the
    # reference do via the -inf masked logw): for masked j > t positions
    # s_j - M_t is unbounded above, exp overflows to +inf, and the VJP of a
    # post-exp jnp.where then multiplies 0-cotangent * inf = NaN. Trained
    # igates spread wide enough to hit this (the round-5 ET-control NaN:
    # finite forward, NaN backward through every ViL-traversing loss).
    delta = s[None, :] - m_local[:, None]
    delta = jnp.where(jnp.tril(jnp.ones((L, L), dtype=bool)), delta, -jnp.inf)
    dec = jnp.exp(delta)
    dot = functools.partial(jnp.matmul, precision=_HI)
    qk = dot(q * scale, k.T)  # (L, L) fp32
    attn = qk * dec

    inter_w = jnp.exp(m_state - m_local)[:, None]  # (L, 1)
    num = dot(attn, v) + inter_w * dot(q * scale, c_state)
    rowsum = jnp.sum(attn, axis=1, keepdims=True) + inter_w * dot(
        q * scale, n_state)[:, None]
    max_log = a + m_local  # true rowwise stabilizer m_t
    # Clamp the normalizer exponent: for max_log < -60 the true h is below
    # fp32 resolution anyway (num <= L*|qk||v| << e^60), while an unclamped
    # exp(-max_log) overflows to inf and NaNs the maximum() VJP the same way.
    denom = jnp.maximum(jnp.abs(rowsum),
                        jnp.exp(-jnp.maximum(max_log, -60.0))[:, None]) + eps
    h = num / denom

    # State update to the end of this chunk.
    m_new = jnp.maximum(m_state, jnp.max(s))
    kv_w = jnp.exp(s - m_new)[:, None]  # (L, 1)
    decay_old = jnp.exp(m_state - m_new)
    c_state = decay_old * c_state + dot((k * kv_w).T, v)
    n_state = decay_old * n_state + jnp.sum(k * kv_w, axis=0)
    m_state = a[-1] + m_new
    return (c_state, n_state, m_state), h


def mlstm_chunkwise(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    igate: jnp.ndarray,
    fgate: jnp.ndarray,
    chunk_size: int = 128,
    eps: float = MLSTM_EPS,
    use_remat: bool = True,
    init_state=None,
    return_state: bool = False,
):
    """Linear-in-S chunkwise mLSTM, numerically identical to
    `mlstm_quadratic` (up to fp assoc.) with O(S*L + DH^2) memory.

    Args:
        q, k, v: (B, NH, S, DH); igate/fgate: (B, NH, S).
        init_state: optional boundary state (C, n, m) with shapes
            (B, NH, DH, DH), (B, NH, DH), (B, NH) — e.g. carried in from the
            preceding sequence shard (parallel/seq.py).
        return_state: also return the final boundary state.
    Returns:
        (B, NH, S, DH) fp32 h (and the final (C, n, m) if return_state).
    """
    B, NH, S, DH = q.shape
    L = min(chunk_size, S)
    pad = (-S) % L
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # Padded keys must contribute nothing: igate -> -inf-ish; padded
        # forget gates -> +inf so log_sigmoid = 0 (no spurious decay of the
        # carried state when return_state is used).
        ip = jnp.pad(igate, ((0, 0), (0, 0), (0, pad)), constant_values=-1e30)
        fp = jnp.pad(fgate, ((0, 0), (0, 0), (0, pad)), constant_values=1e30)
    else:
        qp, kp, vp, ip, fp = q, k, v, igate, fgate
    Sp = S + pad
    nchunks = Sp // L

    f32 = jnp.float32
    lf = _log_sigmoid(fp.astype(f32))

    if init_state is None:
        flat_init = None
    else:
        c0, n0, m0 = init_state
        flat_init = (c0.reshape(B * NH, DH, DH).astype(f32),
                     n0.reshape(B * NH, DH).astype(f32),
                     m0.reshape(B * NH).astype(f32))

    def per_head(qh, kh, vh, ih, lfh, st):
        # (Sp, DH) -> chunked (nchunks, L, DH)
        qc = qh.reshape(nchunks, L, DH).astype(f32)
        kc = kh.reshape(nchunks, L, DH).astype(f32)
        vc = vh.reshape(nchunks, L, DH).astype(f32)
        ic = ih.reshape(nchunks, L).astype(f32)
        lfc = lfh.reshape(nchunks, L)
        if st is None:
            init = (jnp.zeros((DH, DH), f32), jnp.zeros((DH,), f32),
                    jnp.float32(-jnp.inf))
        else:
            init = st
        body = functools.partial(_chunk_scan_body, eps=eps)
        if use_remat:
            body = jax.checkpoint(body)
        final, h = jax.lax.scan(body, init, (qc, kc, vc, ic, lfc))
        return h.reshape(Sp, DH), final

    flat = lambda x: x.reshape((B * NH,) + x.shape[2:])
    if flat_init is None:
        h, final = jax.vmap(lambda a, b, c, d, e: per_head(a, b, c, d, e, None)
                            )(flat(qp), flat(kp), flat(vp), flat(ip), flat(lf))
    else:
        h, final = jax.vmap(per_head)(flat(qp), flat(kp), flat(vp), flat(ip),
                                      flat(lf), flat_init)
    h = h.reshape(B, NH, Sp, DH)[:, :, :S]
    if not return_state:
        return h
    c_f, n_f, m_f = final
    state = (c_f.reshape(B, NH, DH, DH), n_f.reshape(B, NH, DH),
             m_f.reshape(B, NH))
    return h, state
