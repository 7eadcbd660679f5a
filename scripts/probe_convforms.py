"""Probe alternative 3D-conv formulations on the chip (round-2 perf push).

Candidates for killing the slab roll/mask/add chain and the depthfold
concat barrier (see /tmp/hlo_fwd.txt analysis: those chains move ~3x the
conv's own traffic at 128^3):

- slab      : current default — kd 2D convs + roll/mask/add on the output.
- depthfold : concat kd shifted views on channels, one 2D conv.
- negpad    : kd convs with THREE spatial dims and kernel (1,kh,kw); the
              depth shift is expressed as NEGATIVE lhs padding on D, which
              the conv window machinery applies for free (no roll, no mask,
              no extra pass). Outputs summed.

Usage: python scripts/probe_convforms.py [SIZE]
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


def conv_negpad(x, w, stride=1):
    """(B,D,H,W,Cin) x (kd,kh,kw,Cin,Cout) -> (B,D',H',W',Cout).
    kd passes of a 3-spatial-dim conv with kernel (1,kh,kw); the depth tap
    offset becomes negative/positive padding on D."""
    kd, kh, kw, Cin, Cout = w.shape
    pad_d = (kd - 1) // 2
    ph = ((kh - 1) // 2,) * 2
    pw = ((kw - 1) // 2,) * 2
    out = None
    for k in range(kd):
        shift = k - pad_d
        y = jax.lax.conv_general_dilated(
            x, w[k:k + 1], (stride, stride, stride),
            [(-shift, shift), ph, pw],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = y if out is None else out + y
    return out


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from xlstm_hved_tpu.ops.conv3d import conv3d_slab

    rng = np.random.RandomState(0)
    for (cin, cout, k, s, tag) in [
        (16, 16, 3, size, "enc0-ish 16->16 k3"),
        (16, 32, 3, size, "16->32 k3"),
        (4, 4, 7, size, "gate 4->4 k7"),
        (48, 16, 3, size, "dec join 48->16 k3"),
    ]:
        x = jnp.asarray(rng.rand(1, s, s, s, cin), jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, k, cin, cout) * 0.1, jnp.bfloat16)

        ref = None
        for mode in ("slab", "depthfold", "negpad"):
            if mode == "negpad":
                f = lambda xi: jnp.mean(jnp.abs(
                    conv_negpad(xi, w).astype(jnp.float32)))
                y = conv_negpad(x, w)
            else:
                f = lambda xi, mode=mode: jnp.mean(jnp.abs(
                    conv3d_slab(xi, w, mode=mode).astype(jnp.float32)))
                y = conv3d_slab(x, w, mode=mode)
            if ref is None:
                ref = np.asarray(y, np.float32)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
            t = loop_time(f, x)
            gb = x.size * 2 / 1e9
            print(f"{tag:>22} {mode:>10}: {t*1e3:6.2f} ms "
                  f"({gb/t:5.0f} GB/s in-read, maxerr {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
