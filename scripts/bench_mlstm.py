"""On-chip benchmark: XLA chunkwise scan vs fused Pallas kernel for the
mLSTM cell, forward and forward+backward, at S in {1k, 6k, 32k}
(round-1 VERDICT item #6 — decide the Pallas kernel's fate with numbers).

Reference hot kernel being replaced: parallel_stabilized_simple
(/root/reference/UxLSTM/nnunetv2/nets/vision_lstm.py:48-130), O(S^2).

Timing via the relay-safe in-jit fori_loop slope method (see bench.py):
per-iteration input perturbation, nonlinear body, slope between N=4 and
N=16 loops.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.ops.mlstm import mlstm_chunkwise
from xlstm_hved_tpu.ops.mlstm_pallas import mlstm_pallas

B, NH, DH = 1, 4, 16  # flagship ViL: dim 32 -> inner 64, 4 heads, DH 16
CHUNK = 128


def make_inputs(S, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (B, NH, S, DH), jnp.float32)
    k = jax.random.normal(ks[1], (B, NH, S, DH), jnp.float32)
    v = jax.random.normal(ks[2], (B, NH, S, DH), jnp.float32)
    ig = jax.random.normal(ks[3], (B, NH, S)) * 0.5
    fg = 3.0 + 3.0 * jax.random.uniform(ks[4], (B, NH, S))
    return q, k, v, ig, fg


def slope_time(fn, args, n_small=4, n_large=16, reps=3):
    """Seconds per fn() call, measured as an in-jit loop slope."""

    def looped(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                pert = 1e-6 * acc + 1e-5 * i
                out = fn(a[0] + pert, *a[1:])
                return acc + jnp.sum(jnp.abs(out)) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(run(*args))  # compile + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (looped(n_large) - looped(n_small)) / (n_large - n_small)


def main():
    rows = []
    for S in (1024, 6144, 32768):
        args = make_inputs(S)

        scan_fwd = functools.partial(mlstm_chunkwise, chunk_size=CHUNK)
        pallas_fwd = functools.partial(mlstm_pallas, chunk_size=CHUNK)

        def grad_of(f):
            def loss(q, k, v, ig, fg):
                return jnp.sum(jnp.abs(f(q, k, v, ig, fg)))
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))

        def gsum(gf):
            def run(q, k, v, ig, fg):
                gs = gf(q, k, v, ig, fg)
                return sum(jnp.sum(jnp.abs(g)) for g in gs)
            return run

        row = {"S": S}
        row["scan_fwd_ms"] = slope_time(scan_fwd, args) * 1e3
        row["pallas_fwd_ms"] = slope_time(pallas_fwd, args) * 1e3
        row["scan_fwdbwd_ms"] = slope_time(gsum(grad_of(scan_fwd)), args) * 1e3
        row["pallas_fwdbwd_ms"] = slope_time(gsum(grad_of(pallas_fwd)),
                                             args) * 1e3
        # correctness cross-check at this size
        err = float(jnp.max(jnp.abs(
            jax.jit(scan_fwd)(*args) - jax.jit(pallas_fwd)(*args))))
        row["fwd_max_err"] = err
        rows.append(row)
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)
    return rows


if __name__ == "__main__":
    main()
