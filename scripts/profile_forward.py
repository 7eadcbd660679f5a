"""Module-level timing breakdown of the flagship forward on the real chip.

The axon relay caches identical executions and adds ~100 ms dispatch latency,
so every timing here is the slope between an N_SMALL and N_LARGE in-jit
fori_loop with per-iteration input perturbation (same method as bench.py).

Usage:  python scripts/profile_forward.py [SIZE] [SECTION ...]
        SECTION in {forward, encoder, convs, vil, train}; default: forward convs
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def loop_time(fn, x, n_small=4, n_large=20, reps=3):
    """Per-iteration seconds for fn via fori_loop slope timing.

    The perturbation is multiplicative and fn must be NONLINEAR in x
    (use abs/square inside), otherwise XLA's algebraic simplifier hoists
    the body out of the loop and the slope collapses to zero."""

    def run(n):
        @jax.jit
        def body(x):
            def it(i, acc):
                return acc + fn(x * (1.0 + acc * 1e-6 + i * 1e-5))
            return jax.lax.fori_loop(0, n, it, jnp.float32(0))

        # NOTE: on the axon relay jax.block_until_ready can return without
        # waiting for execution; forcing the scalar to host (float()) is the
        # only reliable synchronization.
        float(body(x))  # compile + sync
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(body(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    return (run(n_large) - run(n_small)) / (n_large - n_small)


def main():
    args = sys.argv[1:]
    size = int(args[0]) if args and args[0].isdigit() else 128
    sections = [a for a in args if not a.isdigit()] or ["forward", "convs"]

    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    model = find_model_using_name("XLSTM_HVED", compute_dtype="bfloat16")
    shape = (1, size, size, size, 4)
    x0 = jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x0)
    keep = jnp.asarray(SUBSET_MASKS[14])

    if "forward" in sections:
        def full(xi):
            out = model.apply(variables, xi, keep=keep, recon=True,
                              deterministic=True)
            return jnp.mean(out.seg) + jnp.mean(out.recon)
        t = loop_time(full, x0)
        print(f"full seg+recon fwd @ {size}^3: {t*1e3:.2f} ms")

        def seg_only(xi):
            out = model.apply(variables, xi, keep=keep, recon=False,
                              deterministic=True)
            return jnp.mean(out.seg)
        t = loop_time(seg_only, x0)
        print(f"seg-only fwd       @ {size}^3: {t*1e3:.2f} ms")

    if "convs" in sections:
        # isolated conv building blocks at flagship widths
        from xlstm_hved_tpu.nn.blocks import (BlockDiagDoubleConv, DoubleConv,
                                              instance_norm)

        for level, (cin, cout, s) in enumerate(
                [(4, 4, size), (4, 8, size // 2), (8, 16, size // 4),
                 (16, 32, size // 8)]):
            xb = jnp.asarray(
                np.random.RandomState(1).rand(1, s, s, s, 4 * cin),
                jnp.bfloat16)
            blk = BlockDiagDoubleConv(4, cout, encoder=True, order="ilc",
                                      dtype=jnp.bfloat16)
            vs = jax.jit(blk.init)(jax.random.PRNGKey(0), xb)

            def f(xi, vs=vs, blk=blk):
                return jnp.mean(blk.apply(vs, xi).astype(jnp.float32))
            t = loop_time(f, xb)
            gb = xb.size * 2 / 1e9
            print(f"enc level {level} blockdiag DoubleConv {4*cin}->{4*cout}"
                  f" @ {s}^3: {t*1e3:.2f} ms  (in={gb:.3f} GB,"
                  f" {gb/t:.0f} GB/s eff read bw)")

        # bare instance_norm+leaky chain at the largest map
        xb = jnp.asarray(np.random.RandomState(2).rand(1, size, size, size,
                                                       16), jnp.bfloat16)

        def inl(xi):
            y = instance_norm(xi)
            return jnp.mean(jax.nn.leaky_relu(y, 0.01).astype(jnp.float32))
        t = loop_time(inl, xb)
        gb = xb.size * 2 / 1e9
        print(f"instance_norm+leaky 16ch @ {size}^3: {t*1e3:.2f} ms"
              f"  ({2*gb/t:.0f} GB/s r+w bw)")

    if "micro" in sections:
        from xlstm_hved_tpu.nn.blocks import AttenModule2, resize_trilinear
        from xlstm_hved_tpu.nn.dusfe import DuSEAttention
        from xlstm_hved_tpu.nn.skr import SkrGate

        # trilinear upsample x2 to size^3 at decoder widths
        h = size // 2
        xr = jnp.asarray(np.random.RandomState(11).rand(1, h, h, h, 16),
                         jnp.bfloat16)

        def fr(xi):
            return jnp.mean(jnp.abs(
                resize_trilinear(xi, (size, size, size)).astype(jnp.float32)))
        t = loop_time(fr, xr)
        print(f"resize_trilinear {h}^3->{size}^3 16ch: {t*1e3:.2f} ms")

        xd = jnp.asarray(np.random.RandomState(12).rand(1, size, size, size,
                                                        4), jnp.bfloat16)
        duse = DuSEAttention(4, dtype=jnp.bfloat16)
        vs = jax.jit(duse.init)(jax.random.PRNGKey(0), xd, xd)

        def fd(xi):
            a, b = duse.apply(vs, xi, xi)
            return jnp.mean(jnp.abs(a.astype(jnp.float32)))
        t = loop_time(fd, xd)
        print(f"DuSEAttention 4ch @ {size}^3: {t*1e3:.2f} ms")

        skr = SkrGate(8, dtype=jnp.bfloat16)
        vs2 = jax.jit(skr.init)(jax.random.PRNGKey(0), xd)

        def fs(xi):
            return jnp.mean(jnp.abs(skr.apply(vs2, xi).astype(jnp.float32)))
        t = loop_time(fs, xd)
        print(f"SkrGate(8) on 4ch @ {size}^3: {t*1e3:.2f} ms")

        xa = jnp.asarray(np.random.RandomState(13).rand(1, size, size, size,
                                                        4), jnp.bfloat16)
        att = AttenModule2(dtype=jnp.bfloat16)
        vs3 = jax.jit(att.init)(jax.random.PRNGKey(0), xa, xa)

        def fa(xi):
            return jnp.mean(jnp.abs(
                att.apply(vs3, xi, xi).astype(jnp.float32)))
        t = loop_time(fa, xa)
        print(f"AttenModule2 4ch @ {size}^3: {t*1e3:.2f} ms")

    if "models" in sections:
        # localize time by ablation across zoo variants
        for name in ["XLSTM_HVED_woViL", "XLSTM_HVED_woDuSFE",
                     "U_HVEDConvNet3D"]:
            m = find_model_using_name(name, compute_dtype="bfloat16")
            vs = jax.jit(lambda k, x: m.init(k, x, deterministic=True))(
                {"params": jax.random.PRNGKey(0),
                 "latent": jax.random.PRNGKey(1)}, x0)

            def f(xi, m=m, vs=vs):
                out = m.apply(vs, xi, keep=keep, recon=True,
                              deterministic=True)
                return jnp.mean(out.seg) + jnp.mean(out.recon)
            t = loop_time(f, x0)
            print(f"{name:24s} seg+recon fwd @ {size}^3: {t*1e3:.2f} ms")

    if "bw" in sections:
        # Hypothesis probe: elementwise bandwidth vs logical shape. If the
        # (.., C) last-dim layout starves the VPU (C << 128 lanes), the same
        # byte count reshaped to lane-dense (N, 128) should run ~C/128 faster.
        nbytes = size ** 3 * 16 * 2

        for shp, tag in [
            ((1, size, size, size, 16), "NDHWC C=16"),
            ((1, size, size, size // 8, 128), "folded W/8 C=128"),
            ((nbytes // 2 // 128, 128), "flat (N,128)"),
            ((nbytes // 2 // 512, 512), "flat (N,512)"),
        ]:
            xb = jnp.asarray(np.random.RandomState(5).rand(*shp), jnp.bfloat16)

            def ew(xi):
                return jnp.mean(jnp.abs(xi * 1.25 + 0.5).astype(jnp.float32))
            t = loop_time(ew, xb, n_small=40, n_large=400)
            gb = xb.size * 2 / 1e9
            print(f"elementwise {tag}: {t*1e3:.3f} ms  ({gb/t:.0f} GB/s read)")

        # instance-norm stats at both layouts
        xb = jnp.asarray(np.random.RandomState(6).rand(1, size, size, size,
                                                       16), jnp.bfloat16)

        def st(xi):
            x32 = xi.astype(jnp.float32)
            return jnp.mean(jnp.var(x32, axis=(1, 2, 3)))
        t = loop_time(st, xb, n_small=40, n_large=400)
        print(f"IN stats NDHWC C=16: {t*1e3:.3f} ms"
              f"  ({xb.size*2/1e9/t:.0f} GB/s)")

        xb2 = xb.reshape(1, -1, 16)

        def st2(xi):
            x32 = xi.astype(jnp.float32)
            return jnp.mean(jnp.var(x32, axis=1))
        t = loop_time(st2, xb2, n_small=40, n_large=400)
        print(f"IN stats (B,S,16):   {t*1e3:.3f} ms"
              f"  ({xb2.size*2/1e9/t:.0f} GB/s)")

    if "vil" in sections:
        from xlstm_hved_tpu.nn.vil import ViLLayer3D
        s8 = size // 8
        xb = jnp.asarray(np.random.RandomState(3).rand(1, s8, s8, s8, 32),
                         jnp.float32)
        vil = ViLLayer3D(dim=32, chunk_size=128)
        vs = jax.jit(vil.init)(jax.random.PRNGKey(0), xb)

        def f(xi):
            return jnp.mean(vil.apply(vs, xi))
        t = loop_time(f, xb)
        print(f"mid-ViL (S={s8**3}) @ {s8}^3x32: {t*1e3:.2f} ms")

    if "train" in sections:
        import os

        from xlstm_hved_tpu.config import TrainConfig
        from xlstm_hved_tpu.engine.train import (create_train_state,
                                                 make_train_step)
        from xlstm_hved_tpu.models import Discriminator

        if os.environ.get("XHVED_REMAT"):
            model = find_model_using_name("XLSTM_HVED",
                                          compute_dtype="bfloat16",
                                          remat=True)
        cfg = TrainConfig(crop_size=(size, size, size), num_epochs=10)
        ddt = (jnp.bfloat16 if os.environ.get("XHVED_DISC_DTYPE") == "bfloat16"
               else jnp.float32)
        disc = Discriminator(f_maps=64, kernel=4 if size >= 48 else 3,
                             dtype=ddt)
        state, _ = create_train_state(model, disc, cfg, jax.random.PRNGKey(0),
                                      x0, steps_per_epoch=10)
        step = make_train_step(model, disc, cfg, steps_per_epoch=10)
        mask = (jnp.asarray(np.random.RandomState(4).rand(1, size, size, size,
                                                          3)) > 0.7
                ).astype(jnp.float32)

        # the step donates its state arg — thread it, never reuse a
        # donated buffer (the relay surfaces reuse as backend
        # INVALID_ARGUMENT instead of a host-side deleted-array error)
        state, _ = step(state, x0, mask, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params_g)
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            state, _ = step(state, x0 + i * 1e-4, mask,
                            jax.random.PRNGKey(2 + i))
            jax.block_until_ready(state.params_g)
            times.append(time.perf_counter() - t0)
        print(f"train step @ {size}^3 (host-chained, incl ~100ms dispatch): "
              f"{min(times)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
