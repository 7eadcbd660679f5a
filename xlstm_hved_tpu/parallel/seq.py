"""Sequence-parallel mLSTM over the mesh 'seq' axis.

The reference handles long token lists with a quadratic materialized-matrix
cell on one GPU (/root/reference/UxLSTM/nnunetv2/nets/vision_lstm.py:48-130);
there is no context parallelism of any kind (SURVEY.md §5). Because the
mLSTM carry is ASSOCIATIVE, the sequence axis shards exactly: each device
computes a local summary (C, n, m, F) of its shard, an exclusive prefix of
summaries flows around the ring (ppermute over ICI), and each device then
runs its local chunkwise scan seeded with the incoming boundary state. This
is exact (unlike softmax ring-attention there's no renormalization
bookkeeping beyond the max-tracker).

Summary semantics for a segment: relative to the segment END,
    w_j = i_j + sum_{u>j} lf_u,   m = max_j w_j,
    C = sum_j e^{w_j - m} k_j v_j^T,   n = sum_j e^{w_j - m} k_j,
    F = sum_u lf_u  (total log-forget, used to shift earlier states).
Associative combine (A before B):
    m_AB = max(m_A + F_B, m_B)
    C_AB = e^{m_A + F_B - m_AB} C_A + e^{m_B - m_AB} C_B   (n likewise)
    F_AB = F_A + F_B
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from xlstm_hved_tpu.ops.mlstm import MLSTM_EPS, _log_sigmoid, mlstm_chunkwise


def segment_summary(k: jnp.ndarray, v: jnp.ndarray, igate: jnp.ndarray,
                    fgate: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Summary (C, n, m, F) of a full segment. k, v: (B, NH, S, DH);
    igate/fgate: (B, NH, S)."""
    f32 = jnp.float32
    k, v = k.astype(f32), v.astype(f32)
    lf = _log_sigmoid(fgate.astype(f32))
    a = jnp.cumsum(lf, axis=-1)  # inclusive
    F = a[..., -1]
    w = igate.astype(f32) + (F[..., None] - a)  # i_j + sum_{u>j} lf_u
    m = jnp.max(w, axis=-1)
    wt = jnp.exp(w - m[..., None])
    C = jnp.einsum("bhs,bhsk,bhsv->bhkv", wt, k, v)
    n = jnp.einsum("bhs,bhsk->bhk", wt, k)
    return C, n, m, F


def combine_summaries(A, B):
    """Associative combine of consecutive summaries (A before B)."""
    C_a, n_a, m_a, F_a = A
    C_b, n_b, m_b, F_b = B
    m_ab = jnp.maximum(m_a + F_b, m_b)
    s_a = jnp.exp(m_a + F_b - m_ab)
    s_b = jnp.exp(m_b - m_ab)
    C = s_a[..., None, None] * C_a + s_b[..., None, None] * C_b
    n = s_a[..., None] * n_a + s_b[..., None] * n_b
    return C, n, m_ab, F_a + F_b


def identity_summary(B: int, NH: int, DH: int):
    f32 = jnp.float32
    return (jnp.zeros((B, NH, DH, DH), f32), jnp.zeros((B, NH, DH), f32),
            jnp.full((B, NH), -jnp.inf, f32), jnp.zeros((B, NH), f32))


def mlstm_sequence_parallel(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    igate: jnp.ndarray, fgate: jnp.ndarray,
    axis_name: str = "seq",
    chunk_size: int = 128,
    eps: float = MLSTM_EPS,
) -> jnp.ndarray:
    """Per-shard body to be called under shard_map with the token axis sharded
    over `axis_name`. Inputs are the LOCAL shard (B, NH, S_local, DH)."""
    B, NH, S, DH = q.shape
    P = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # exclusive prefix of summaries via a P-1 step ring: after step t, `acc`
    # on device i holds the combine of summaries i-t..i-1.
    local = segment_summary(k, v, igate, fgate)
    acc = identity_summary(B, NH, DH)
    carry = local
    perm = [(i, (i + 1) % P) for i in range(P)]

    def ring_step(t, state):
        acc, carry = state
        carry = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), carry)
        # device i receives the summary of segment i-1-t; prepend it
        take = t < idx  # only accumulate predecessors (exclusive prefix)
        new_acc = combine_summaries(carry, acc)
        acc = jax.tree.map(lambda a, b: jnp.where(take, a, b), new_acc, acc)
        return acc, carry

    acc, _ = jax.lax.fori_loop(0, P - 1, ring_step, (acc, carry))
    C0, n0, m0, _ = acc
    h = mlstm_chunkwise(q, k, v, igate, fgate, chunk_size=chunk_size, eps=eps,
                        init_state=(C0, n0, m0))
    return h


def make_sharded_mlstm(mesh, chunk_size: int = 128):
    """shard_map-wrapped sequence-parallel mLSTM: global (B, NH, S, DH)
    inputs sharded on S over mesh axis 'seq'."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    spec4 = P(None, None, "seq", None)
    spec3 = P(None, None, "seq")

    fn = functools.partial(mlstm_sequence_parallel, chunk_size=chunk_size)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec3, spec3),
        out_specs=spec4,
        check_rep=False,
    )
