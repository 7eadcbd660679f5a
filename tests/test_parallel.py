"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
sequence-sharded mLSTM equals the unsharded oracle; mesh helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_hved_tpu.ops.mlstm import mlstm_chunkwise, mlstm_quadratic
from xlstm_hved_tpu.parallel.mesh import batch_sharding, make_mesh
from xlstm_hved_tpu.parallel.seq import (
    combine_summaries,
    make_sharded_mlstm,
    segment_summary,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _inputs(key, B=1, NH=2, S=64, DH=8):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, NH, S, DH))
    k = jax.random.normal(ks[1], (B, NH, S, DH))
    v = jax.random.normal(ks[2], (B, NH, S, DH))
    ig = jax.random.normal(ks[3], (B, NH, S)) * 0.5
    fg = 3.0 + 3.0 * jax.random.uniform(ks[4], (B, NH, S))
    return q, k, v, ig, fg


def test_summary_combine_matches_sequential(rng):
    q, k, v, ig, fg = _inputs(rng, S=32)
    # summary of the whole == combine(summary(first half), summary(second))
    whole = segment_summary(k, v, ig, fg)
    first = segment_summary(k[:, :, :16], v[:, :, :16], ig[:, :, :16],
                            fg[:, :, :16])
    second = segment_summary(k[:, :, 16:], v[:, :, 16:], ig[:, :, 16:],
                             fg[:, :, 16:])
    combined = combine_summaries(first, second)
    for a, b in zip(whole, combined):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_chunkwise_state_carry_equals_full(rng):
    q, k, v, ig, fg = _inputs(rng, S=64)
    full = mlstm_chunkwise(q, k, v, ig, fg, chunk_size=16)
    h1, st = mlstm_chunkwise(q[:, :, :32], k[:, :, :32], v[:, :, :32],
                             ig[:, :, :32], fg[:, :, :32], chunk_size=16,
                             return_state=True)
    h2 = mlstm_chunkwise(q[:, :, 32:], k[:, :, 32:], v[:, :, 32:],
                         ig[:, :, 32:], fg[:, :, 32:], chunk_size=16,
                         init_state=st)
    stitched = jnp.concatenate([h1, h2], axis=2)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full),
                               atol=1e-4, rtol=1e-3)


def test_sequence_parallel_matches_quadratic(rng):
    q, k, v, ig, fg = _inputs(rng, S=64)
    ref = mlstm_quadratic(q, k, v, ig, fg)
    mesh = make_mesh(data=1, seq=8)
    with mesh:
        sharded_fn = jax.jit(make_sharded_mlstm(mesh, chunk_size=8))
        out = sharded_fn(q, k, v, ig, fg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_mesh_and_batch_sharding():
    mesh = make_mesh(data=4, seq=2)
    assert mesh.shape == {"data": 4, "seq": 2}
    sh = batch_sharding(mesh)
    x = jax.device_put(jnp.arange(8.0).reshape(8, 1), sh)
    assert len(x.addressable_shards) == 8
