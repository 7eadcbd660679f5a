"""Probe instance-norm formulations + the IN->leaky->conv chain on chip.

The HLO dump shows the current instance_norm (mean + var over materialized
f32 copy, then a separate normalize pass) moving ~2x the minimum traffic at
128^3. Candidates:
  - current   : mean/var via jnp.mean + jnp.var on x.astype(f32)
  - ex2       : one logical read — m1=mean(x32), m2=mean(x32*x32),
                var = m2 - m1^2 (f32 accumulation, bf16 read)
  - chain     : IN -> leaky -> blockdiag conv (order 'ilc'), both forms,
                to see what XLA fuses in-graph.

Usage: python scripts/probe_in.py [SIZE]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def loop_time(fn, x, n_small=4, n_large=20, reps=3):
    def run(n):
        @jax.jit
        def body(x):
            def it(i, acc):
                xi = (x.astype(jnp.float32)
                      * (1.0 + acc * 1e-6 + i * 1e-5)).astype(x.dtype)
                return acc + fn(xi)
            return jax.lax.fori_loop(0, n, it, jnp.float32(0))

        float(body(x))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(body(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    return (run(n_large) - run(n_small)) / (n_large - n_small)


def in_current(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def in_ex2(x, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    m1 = jnp.mean(x32, axis=axes, keepdims=True)
    m2 = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m1), 0.0)
    return ((x32 - m1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from xlstm_hved_tpu.ops.conv3d import conv3d_slab

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, size, size, size, 16), jnp.bfloat16)
    gb = x.size * 2 / 1e9

    for name, f in (("IN current", in_current), ("IN ex2", in_ex2)):
        t = loop_time(lambda xi, f=f: jnp.mean(jnp.abs(
            f(xi).astype(jnp.float32))), x)
        print(f"{name}: {t*1e3:6.2f} ms ({2*gb/t:5.0f} GB/s r+w)", flush=True)

    w = jnp.asarray(rng.rand(3, 3, 3, 16, 16) * 0.1, jnp.bfloat16)

    for name, f in (("current", in_current), ("ex2", in_ex2)):
        for mode in ("slab", "depthfold"):
            def chain(xi, f=f, mode=mode):
                y = jax.nn.leaky_relu(f(xi), 0.01)
                y = conv3d_slab(y, w, mode=mode)
                return jnp.mean(jnp.abs(y.astype(jnp.float32)))
            t = loop_time(chain, x)
            print(f"chain IN({name})+leaky+conv[{mode}]: {t*1e3:6.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
