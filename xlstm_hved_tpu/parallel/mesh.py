"""Device mesh and sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(/root/reference/train.py:148-151). The TPU-native equivalent: one
jax.sharding.Mesh with axes ('data', 'seq'); batches are sharded over 'data'
(XLA emits the gradient all-reduce over ICI), parameters are replicated, and
the mLSTM token sequence can be sharded over 'seq' (parallel/seq.py rides the
associative (C, n, m) carry around the ring). Multi-host extends the same
mesh via jax.distributed.initialize (DCN across slices).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: jax.distributed.initialize (SURVEY.md §2.6 —
    the reference has no multi-process support at all; this is the TPU-native
    DDP equivalent, DCN across slices, ICI within). On TPU pods the args are
    auto-detected from the environment; pass them explicitly elsewhere.
    Idempotent: safe to call when already initialized or single-process.

    NOTE: must not touch jax.process_count()/jax.devices() before
    initializing — any backend-initializing call turns
    jax.distributed.initialize into a silent no-op (caught by
    tests/test_multiprocess.py); the already-initialized check reads the
    distributed client state directly instead."""
    try:  # private JAX API with no stability guarantee — probe defensively
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass  # fall through: initialize() below tolerates double-init
    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # single-process / already-initialized environments
        print(f"jax.distributed.initialize skipped: {e}")


def make_mesh(data: Optional[int] = None, seq: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over (data, seq). Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // seq
    assert data * seq <= len(devices), (
        f"mesh {data}x{seq} needs {data*seq} devices, have {len(devices)}")
    arr = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(arr, axis_names=("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch arrays with the batch axis over 'data'.

    Single-host: device_put with a NamedSharding. Multi-host: each process
    holds only its local shard of the global batch, so the global array is
    assembled with jax.make_array_from_process_local_data (the local batch
    axis concatenates across processes in process order)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def allreduce_averages(avgs: dict) -> dict:
    """Cross-host reduction of a dict of RunningAverage accumulators into
    global means.

    Each host validates only its own data shard; the reference
    (single-process nn.DataParallel) never faced this, but multi-host JAX
    does: without this reduction rank-0's local average alone would decide
    best-checkpoint tracking. Gathers (sum, count) pairs from every process
    and returns {key: global_sum / global_count}. Single-process: plain
    local averages (no device traffic at all)."""
    keys = sorted(avgs)
    if jax.process_count() == 1:
        return {k: avgs[k].avg for k in keys}
    from jax.experimental import multihost_utils

    local = np.asarray(
        [[avgs[k].sum for k in keys], [float(avgs[k].count) for k in keys]],
        np.float64)  # (2, K): sums row, counts row
    gathered = multihost_utils.process_allgather(local)  # (P, 2, K)
    sums = gathered[:, 0, :].sum(axis=0)
    counts = gathered[:, 1, :].sum(axis=0)
    return {k: float(sums[i] / max(counts[i], 1.0))
            for i, k in enumerate(keys)}
