"""Diagnose the host-RSS leak that OOM-killed the 100-epoch protocol run.

The kernel OOM log showed the training python at 130 GB anon-rss after
~110 epochs x 32 steps at the 128x192x128 crop — ~35 MB/step, about one
input batch per step. This probe runs the real train loop innards (loader ->
assemble -> shard -> donated jitted step -> float() metric sync) on CPU at a
reduced crop and prints RSS every few steps. Linear growth here = retention
in our loop/loader; flat here = the leak lives in the axon relay client's
host mirrors (then the fix is explicit buffer deletion / transfer guard).
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    from xlstm_hved_tpu.cli.common import assemble_train_batch
    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.data.brats import BraTSDataset, prefetch_loader
    from xlstm_hved_tpu.engine.train import create_train_state, make_train_step
    from xlstm_hved_tpu.models import Discriminator, find_model_using_name
    from xlstm_hved_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    crop = (32, 64, 32)
    data_dir = "/root/repo/runs/fullscale/data/valid"  # small split is enough
    ds = BraTSDataset(data_dir, seed=0)
    cfg = TrainConfig(crop_size=crop, num_epochs=50)
    model = find_model_using_name("XLSTM_HVED", compute_dtype="bfloat16")
    disc = Discriminator(f_maps=32, kernel=3, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, *crop, 4), jnp.float32)
    state, _ = create_train_state(model, disc, cfg, rng, sample, 8)
    step_fn = make_train_step(model, disc, cfg, 8)
    mesh = make_mesh(data=1)

    print(f"after init: RSS {rss_mb():.0f} MB", flush=True)
    with mesh:
        state = replicate(mesh, state)
        n = 0
        base = None
        for epoch in range(50):
            for items in prefetch_loader(ds, 1, shuffle=True, seed=epoch):
                rng, k_aug, k_step = jax.random.split(rng, 3)
                x, _xm, mask = assemble_train_batch(items, crop, k_aug)
                x, mask = shard_batch(mesh, (x, mask))
                state, metrics = step_fn(state, x, mask, k_step)
                _ = float(metrics["loss"])
                n += 1
                if n % 8 == 0:
                    cur = rss_mb()
                    if base is None:
                        base = cur
                    print(f"step {n:4d}: RSS {cur:7.0f} MB "
                          f"(+{cur - base:6.0f})", flush=True)
            if n >= 200:
                break
    per_step = (rss_mb() - base) / max(n - 8, 1)
    print(f"growth ~{per_step:.2f} MB/step over {n} steps "
          f"(batch x+mask ~{(np.prod(crop) * 7 * 4) / 1e6:.1f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
