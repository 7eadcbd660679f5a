"""Time the mLSTM forward and fwd+bwd: XLA chunkwise scan vs fused Pallas
kernels, at the flagship bottleneck S=6144 and the long-sequence S=32768.

Relay-safe methodology (see bench.py / docs/PERFORMANCE.md): each variant
runs inside ONE jitted fori_loop whose body is nonlinear in a perturbed
input; the per-step time is the slope between a small-N and a large-N loop,
and the only reliable sync on the axon relay is forcing a scalar to host.

Usage: python scripts/bench_mlstm_bwd.py [--short]
Prints one JSON line per (S, variant, pass).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.ops.mlstm import mlstm_chunkwise
from xlstm_hved_tpu.ops.mlstm_pallas import mlstm_pallas

B, NH, DH = 1, 8, 16
CHUNK = 128


def make_fn(kind: str, backward: bool, S: int):
    if kind == "scan":
        f = functools.partial(mlstm_chunkwise, chunk_size=CHUNK)
    elif kind == "pallas":
        f = functools.partial(mlstm_pallas, chunk_size=CHUNK)
    else:  # pallas forward + scan-recompute backward (the pre-r3 VJP)
        f = functools.partial(mlstm_pallas, chunk_size=CHUNK, eps=1e-6,
                              interpret=False, bwd_mode="scan")

    def loss(q, k, v, ig, fg):
        return jnp.sum(jnp.tanh(f(q, k, v, ig, fg)))

    if backward:
        def step(q, k, v, ig, fg):
            l, g = jax.value_and_grad(loss, argnums=(0, 3, 4))(q, k, v, ig, fg)
            return l + sum(jnp.sum(jnp.abs(x)) for x in g)
    else:
        step = loss
    return step


def timed(step, S: int, n_small: int, n_large: int):
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, NH, S, DH), jnp.float32)
    k = jnp.asarray(r.randn(B, NH, S, DH), jnp.float32)
    v = jnp.asarray(r.randn(B, NH, S, DH), jnp.float32)
    ig = jnp.asarray(r.randn(B, NH, S) * 0.5, jnp.float32)
    fg = jnp.asarray(3 + 3 * r.rand(B, NH, S), jnp.float32)

    def loop(n):
        @jax.jit
        def run(q):
            def body(i, acc):
                return acc + step(q + acc * 1e-6 + i * 1e-4, k, v, ig, fg)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(run(q))  # compile + sync
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(q))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_s, t_l = loop(n_small), loop(n_large)
    return (t_l - t_s) / (n_large - n_small)


def gradcheck():
    """On-chip numerical validation of the Mosaic-compiled fused backward
    BEFORE any timing (round-3 ADVICE: every gradient-parity test runs with
    interpret=True on CPU, so a real-TPU lowering bug — reversed index maps,
    SMEM scalar carry, multi-output specs — would silently corrupt training
    gradients). Compares value_and_grad w.r.t. ALL FIVE inputs, fused kernel
    vs the scan VJP, on the compiled backend; includes a non-chunk-multiple
    S to cover the padding path."""
    for S in (2000, 6144):
        r = np.random.RandomState(1)
        q = jnp.asarray(r.randn(B, NH, S, DH), jnp.float32)
        k = jnp.asarray(r.randn(B, NH, S, DH), jnp.float32)
        v = jnp.asarray(r.randn(B, NH, S, DH), jnp.float32)
        ig = jnp.asarray(r.randn(B, NH, S) * 0.5, jnp.float32)
        fg = jnp.asarray(3 + 3 * r.rand(B, NH, S), jnp.float32)

        def loss(mode, *args):
            f = functools.partial(mlstm_pallas, chunk_size=CHUNK,
                                  bwd_mode=mode)
            return jnp.sum(jnp.tanh(f(*args)))

        worst = 0.0
        for mode in ("fused",):
            gf = jax.jit(jax.grad(functools.partial(loss, "fused"),
                                  argnums=(0, 1, 2, 3, 4)))(q, k, v, ig, fg)
            gs = jax.jit(jax.grad(functools.partial(loss, "scan"),
                                  argnums=(0, 1, 2, 3, 4)))(q, k, v, ig, fg)
            for a, b in zip(gf, gs):
                err = float(jnp.max(jnp.abs(a - b) / (1.0 + jnp.abs(b))))
                worst = max(worst, err)
        print(json.dumps({"S": S, "gradcheck_fused_vs_scan_max_scaled_err":
                          round(worst, 8),
                          "backend": jax.default_backend()}), flush=True)
        assert worst < 1e-3, (
            f"fused backward disagrees with the scan VJP on "
            f"{jax.default_backend()} at S={S}: {worst}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", action="store_true",
                    help="fewer loop iterations (smoke)")
    args = ap.parse_args()
    n_small, n_large = (2, 6) if args.short else (4, 20)

    gradcheck()

    for S in (6144, 32768):
        for backward in (False, True):
            rows = {}
            for kind in ("scan", "pallas_scanbwd", "pallas"):
                if not backward and kind == "pallas_scanbwd":
                    continue  # identical forward to "pallas"
                step = make_fn(kind, backward, S)
                dt = timed(step, S, n_small, n_large)
                rows[kind] = dt
                print(json.dumps({
                    "S": S, "pass": "fwd+bwd" if backward else "fwd",
                    "variant": kind, "ms_per_step": round(dt * 1e3, 3),
                }), flush=True)
            if backward and "pallas" in rows and "scan" in rows:
                print(json.dumps({
                    "S": S, "speedup_fused_vs_scan":
                        round(rows["scan"] / rows["pallas"], 2),
                    "speedup_fused_vs_pallas_scanbwd":
                        round(rows["pallas_scanbwd"] / rows["pallas"], 2),
                }), flush=True)


if __name__ == "__main__":
    main()
