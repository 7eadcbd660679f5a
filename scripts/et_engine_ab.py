"""Engine-isolation A/B for the ET-channel collapse (round-5 follow-up to
scripts/torch_control_et.py).

The first control showed the torch chain LEARNS ET (dice 0.4+) while our
engine suppresses it to 0.000 on identical data — but the two arms start
from different initial weights: the reference protocol applies
utils.py:191-201 init_weights (kaiming kernels, conv biases ~ N(0,1)) while
our engine he_normal-inits kernels and zero-inits biases.

This script removes that confound: it regenerates the torch chain's exact
finetune-initial state (same seeds: pretrain 8 epochs -> head-pop surgery)
plus the torch discriminator init, TRANSPLANTS both into our engine via
utils/torch_import, and runs OUR finetune from that identical starting
point on the identical data.

  - ET rises   -> the collapse was an init-scheme/basin effect; our engine
                  dynamics are fine and the fix is a reference-init option.
  - ET falls   -> a real engine defect downstream of the (already
                  step-parity-tested) gradient computation: optimizer/
                  stochastic-stream/loss-schedule coupling.

Appends rows impl=jax_torchinit to docs/fullscale/torch_control_et.csv.
CPU-only.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from torch_control_et import (ALPHA, BETA, LR, N_TRAIN, N_VALID,  # noqa: E402
                              SHAPE, WD, hard_dice, make_data)


def torch_surgery_state(xt, pre_epochs):
    """Re-run the torch pretrain -> surgery chain with the control's seeds;
    returns (ft_state_dict, disc_state_dict) at the finetune start point."""
    import importlib

    import torch

    from ref_loader import load_reference

    ra = load_reference()
    loss_mod = importlib.import_module("loss")
    utils_mod = importlib.import_module("utils")
    l2 = torch.nn.MSELoss()
    xt = torch.from_numpy(xt)

    def build(shared_recon):
        torch.manual_seed(0 if shared_recon else 1)
        m = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                          shared_recon=shared_recon, recon_skip=True,
                          MVAE_reduction=True, final_sigmoid=True,
                          f_maps=4, layer_order="ilc")
        m.apply(utils_mod.init_weights)
        return m

    np.random.seed(0)
    t0 = time.time()
    pre = build(shared_recon=False)
    for p in pre.srdecoder.sdecoders.parameters():
        p.requires_grad = False
    opt = torch.optim.Adam(pre.parameters(), lr=LR, weight_decay=WD)
    for epoch in range(1, pre_epochs + 1):
        for i in range(N_TRAIN):
            x = xt[i:i + 1]
            subset = utils_mod.subset_idx(np.random.choice(range(1, 4), 1))
            _, (mu, logvar), m_rec = pre(x, subset, recon=True, seg=False)
            m_rec = torch.cat(m_rec, dim=1)
            kld = sum(loss_mod.compute_KLD(mu[j], logvar[j], subset)
                      for j in range(len(mu))) / len(mu)
            loss = l2(m_rec, x) + BETA * kld
            opt.zero_grad()
            loss.backward()
            opt.step()
        print(f"[torch pretrain {epoch}/{pre_epochs}] loss {float(loss):.4f}"
              f" ({time.time() - t0:.0f}s)", flush=True)

    ft = build(shared_recon=True)
    sd = {k: v.clone() for k, v in pre.state_dict().items()}
    for k in ("rdecoder.finals.0.weight", "rdecoder.finals.0.bias",
              "srdecoder.rfinals.0.weight", "srdecoder.rfinals.0.bias",
              "srdecoder.sfinals.0.weight", "srdecoder.sfinals.0.bias"):
        sd.pop(k, None)
    ft.load_state_dict(sd, strict=False)

    torch.manual_seed(7)
    disc = ra.Discriminator(in_channels=7, ks=4, strides=[1, 2, 2, 2])
    disc.apply(utils_mod.init_weights)
    return ft.state_dict(), disc.state_dict()


def run_ours_from(ft_sd, disc_sd, xt, mt, xv, mv, ft_epochs, rows,
                  subset_rows):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.engine.train import create_train_state, make_train_step
    from xlstm_hved_tpu.models import Discriminator, find_model_using_name
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS
    from xlstm_hved_tpu.utils.torch_import import (disc_params_from_torch,
                                                   hved_params_from_torch)

    enable_persistent_cache()
    xt_j = jnp.asarray(np.moveaxis(xt, 1, -1))
    mt_j = jnp.asarray(np.moveaxis(mt, 1, -1))
    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))

    t0 = time.time()
    ft_model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params_g, stats_g = hved_params_from_torch(ft_sd, ft_model.cfg)
    disc = Discriminator(f_maps=64, kernel=4, dtype=jnp.float32)
    params_d = disc_params_from_torch(disc_sd, num_levels=4)

    cfg_ft = TrainConfig(crop_size=SHAPE, num_epochs=ft_epochs)
    ft_state, _ = create_train_state(ft_model, disc, cfg_ft,
                                     jax.random.PRNGKey(1), xt_j[:1], N_TRAIN)
    chex_assert = jax.tree.structure(ft_state.params_g)
    assert chex_assert == jax.tree.structure(params_g), "param tree mismatch"
    ft_state = ft_state.replace(params_g=params_g, batch_stats_g=stats_g,
                                params_d=params_d)
    print(f"[ab] transplanted torch surgery-point G + D init "
          f"({time.time()-t0:.0f}s)", flush=True)

    tstep = jax.jit(make_train_step(ft_model, disc, cfg_ft, N_TRAIN))
    fwd = jax.jit(lambda v, x: ft_model.apply(
        v, x, keep=jnp.ones((1, 4), jnp.float32), recon=True,
        deterministic=True))
    rng = jax.random.PRNGKey(42)
    for epoch in range(1, ft_epochs + 1):
        for i in range(N_TRAIN):
            rng, k = jax.random.split(rng)
            ft_state, metrics = tstep(ft_state, xt_j[i:i + 1],
                                      mt_j[i:i + 1], k)
        mvars = {"params": ft_state.params_g}
        if ft_state.batch_stats_g:
            mvars["batch_stats"] = ft_state.batch_stats_g
        out = fwd(mvars, xv_j)
        seg = np.moveaxis(np.asarray(out.seg, np.float32), -1, 1)
        rec = np.asarray(out.recon, np.float32)
        d = hard_dice(seg, mv)
        p = float(10 * np.log10(1.0 / np.mean((rec - np.asarray(xv_j)) ** 2)))
        rows.append(("jax_torchinit", epoch, *d, p))
        print(f"[jax_torchinit finetune {epoch}/{ft_epochs}] "
              f"WT {d[0]:.4f} TC {d[1]:.4f} ET {d[2]:.4f} PSNR {p:.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    sweep_fwd = jax.jit(lambda v, x, k: ft_model.apply(
        v, x, keep=k, recon=False, deterministic=True).seg)
    mvars = {"params": ft_state.params_g}
    if ft_state.batch_stats_g:
        mvars["batch_stats"] = ft_state.batch_stats_g
    for idx in range(15):
        keep = jnp.asarray(SUBSET_MASKS[idx], jnp.float32)
        xz = xv_j * keep[None, None, None, None, :]
        seg = np.moveaxis(
            np.asarray(sweep_fwd(mvars, xz, keep), np.float32), -1, 1)
        d = hard_dice(seg, mv)
        subset_rows.append(("jax_torchinit", idx, *d))
        print(f"[jax_torchinit subset {idx}] WT {d[0]:.4f} TC {d[1]:.4f} "
              f"ET {d[2]:.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre_epochs", type=int, default=8)
    ap.add_argument("--ft_epochs", type=int, default=24)
    args = ap.parse_args()

    xt, mt = make_data(N_TRAIN, seed=0)
    xv, mv = make_data(N_VALID, seed=1000)

    ft_sd, disc_sd = torch_surgery_state(xt, args.pre_epochs)

    rows, subset_rows = [], []
    try:
        run_ours_from(ft_sd, disc_sd, xt, mt, xv, mv, args.ft_epochs, rows,
                      subset_rows)
    finally:
        out = os.path.join(ROOT, "docs", "fullscale", "torch_control_et.csv")
        with open(out, "a", newline="") as f:
            csv.writer(f).writerows(rows)
        out2 = os.path.join(ROOT, "docs", "fullscale",
                            "torch_control_et_subsets.csv")
        with open(out2, "a", newline="") as f:
            csv.writer(f).writerows(subset_rows)
        print(f"appended {len(rows)} + {len(subset_rows)} rows", flush=True)


if __name__ == "__main__":
    main()
