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
    Idempotent: safe to call when already initialized or single-process."""
    if jax.process_count() > 1:
        return  # already initialized
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
