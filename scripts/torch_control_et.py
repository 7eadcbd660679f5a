"""Reference-native control for the ET-channel stall in the protocol run
(round-3 VERDICT Weak #3 follow-up): the round-4 protocol run on the fixed
label alphabet (ET = 25% of tumor, max intensity contrast) still leaves ET
dice ~0.03 after 16+ epochs while TC converges past 0.7, and the in-flight
probe (scripts/diag_et_channel.py) shows the ET channel sitting near 0.5
everywhere with in-region probability BELOW background — a soft suppression,
not a dead channel.

This script answers "whose behavior is that?" by running the SAME recipe at
matched tiny scale (32^3 full-volume, no crop/augment, same synthetic
subjects) through BOTH implementations:

  A. the reference's own torch chain — pretrain (Pretrain.py:196-366) ->
     head-popping surgery (utils.py:102-139) -> adversarial finetune
     (train.py:218-285) — logging per-channel hard valid dice per epoch;
  B. our JAX engine (make_pretrain_step -> surgical_restore ->
     make_train_step) on the identical data.

If the torch reference's ET trajectory is also flat/suppressed over the
same budget, the stall is the protocol recipe's own small-structure
dynamics under dice + GAN coupling (the round-3 "reference-reproduces-it"
pattern); if torch learns ET and we don't, it's our defect.

Writes docs/fullscale/torch_control_et.csv. CPU-only, niced-friendly.
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

ALPHA, BETA = 0.1, 0.2  # train.py:43-44
LR, WD = 1e-4, 1e-5     # train.py:164-178
SHAPE = (32, 32, 32)
N_TRAIN, N_VALID = 6, 2


def make_data(n, seed):
    """Synthetic volumes + nested WT/TC/ET masks, /255 normalized, as
    (N, 4, D, H, W) images and (N, 3, D, H, W) masks (torch layout)."""
    from xlstm_hved_tpu.data.synthetic import synthetic_subject

    rng = np.random.RandomState(seed)
    xs, ms = [], []
    for _ in range(n):
        img, labels = synthetic_subject(rng, SHAPE)
        x = img.astype(np.float32) / 255.0
        wt = labels > 0
        tc = (labels >= 1) & (labels <= 3)
        et = labels == 1
        xs.append(x)
        ms.append(np.stack([wt, tc, et]).astype(np.float32))
    return np.stack(xs), np.stack(ms)


def hard_dice(pred, true):
    """Per-channel hard (>0.5) dice over the batch; pred/true (N,3,...)."""
    out = []
    for c in range(3):
        p = pred[:, c] > 0.5
        t = true[:, c] > 0.5
        out.append(2.0 * (p & t).sum() / max(p.sum() + t.sum(), 1))
    return out


# ---------------------------------------------------------------- torch side

def run_torch(xt, mt, xv, mv, pre_epochs, ft_epochs, rows, subset_rows):
    import importlib

    import torch

    from ref_loader import load_reference

    ra = load_reference()
    loss_mod = importlib.import_module("loss")
    utils_mod = importlib.import_module("utils")
    dice_loss = loss_mod.DiceLoss()
    gan_loss = loss_mod.GANLoss()
    l2 = torch.nn.MSELoss()

    xt = torch.from_numpy(xt)
    mt = torch.from_numpy(mt)
    xv = torch.from_numpy(xv)

    def build(shared_recon):
        torch.manual_seed(0 if shared_recon else 1)
        m = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                          shared_recon=shared_recon, recon_skip=True,
                          MVAE_reduction=True, final_sigmoid=True,
                          f_maps=4, layer_order="ilc")
        # the reference applies its init scheme after construction
        # (train.py:145, Pretrain.py:149, utils.py:191-215)
        m.apply(utils_mod.init_weights)
        return m

    def valid_eval(model):
        model.eval()
        with torch.no_grad():
            seg, _, rec = model(xv, [14], valid=True, recon=True)
            rec = torch.cat(rec, dim=1) if isinstance(rec, list) else rec
        model.train()
        d = hard_dice(seg.numpy(), mv)
        p = float(10 * torch.log10(1.0 / torch.mean((rec - xv) ** 2)))
        return d, p

    def nested_weight(seg):  # train.py:247-259, functional form
        w = torch.where(seg > 0.5, seg, torch.zeros_like(seg))
        nested = w[:, 0].clone()
        for c in (1, 2):
            m = w[:, c] > 0.5
            nested[m] = w[:, c][m]
        return nested

    np.random.seed(0)
    t0 = time.time()

    pre = build(shared_recon=False)
    for p in pre.srdecoder.sdecoders.parameters():  # Pretrain.py:146-148
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
        sd.pop(k, None)  # pops present (commented out) at utils.py:126-133;
        # popping is REQUIRED here: shared_recon changes these heads' shapes
        # and the reference's active strict=False load would raise on them
    ft.load_state_dict(sd, strict=False)
    # surgery-point snapshot: lets a follow-up arm start OUR engine from the
    # torch chain's exact finetune-initial weights (isolates engine dynamics
    # from the init-scheme difference — reference init_weights draws conv
    # biases from N(0,1), utils.py:191-201, where our engine zero-inits)
    torch.save(ft.state_dict(),
               os.path.join(ROOT, "runs", "torch_control_ft_init.pt"))

    import torch as _t
    _t.manual_seed(7)
    disc = ra.Discriminator(in_channels=7, ks=4, strides=[1, 2, 2, 2])
    disc.apply(utils_mod.init_weights)  # train.py:147
    opt_g = _t.optim.Adam(ft.parameters(), lr=LR, weight_decay=WD)
    opt_d = _t.optim.Adam(disc.parameters(), lr=LR, weight_decay=WD)
    # the reference steps BOTH schedulers every epoch (train.py:444-445);
    # the JAX arm's make_optimizer poly schedule likewise decays G and D
    sch_g = _t.optim.lr_scheduler.LambdaLR(
        opt_g, lambda e: (1 - e / ft_epochs) ** 0.9)
    sch_d = _t.optim.lr_scheduler.LambdaLR(
        opt_d, lambda e: (1 - e / ft_epochs) ** 0.9)
    ft.train()
    disc.train()
    for epoch in range(1, ft_epochs + 1):
        for i in range(N_TRAIN):
            x, m = xt[i:i + 1], mt[i:i + 1]
            subset = utils_mod.subset_idx(np.random.choice(range(1, 4), 1))
            f_out, _, f_rec = ft(x, [14], recon=True)
            m_out, (mu, logvar), m_rec = ft(x, subset, recon=True)
            f_rec = torch.cat(f_rec, dim=1)
            m_rec = torch.cat(m_rec, dim=1)
            kld = sum(loss_mod.compute_KLD(mu[j], logvar[j], subset)
                      for j in range(len(mu))) / len(mu)
            atten_f = f_rec.detach() * (
                1 + nested_weight(f_out.detach()).unsqueeze(1))
            atten_m = m_rec * (1 + nested_weight(m_out.detach()).unsqueeze(1))
            g_gan = gan_loss(disc(torch.cat([m_out, atten_m], 1)), True)
            loss = (dice_loss(f_out, m) + dice_loss(m_out, m)
                    + BETA * l2(m_rec, x) + BETA * kld + ALPHA * g_gan)
            opt_g.zero_grad()
            loss.backward()
            opt_g.step()

            loss_d = ALPHA * 0.5 * (
                gan_loss(disc(torch.cat([m_out.detach(),
                                         atten_m.detach()], 1)), False) +
                gan_loss(disc(torch.cat([f_out.detach(),
                                         atten_f.detach()], 1)), True))
            opt_d.zero_grad()
            loss_d.backward()
            opt_d.step()
        sch_g.step()
        sch_d.step()
        d, p = valid_eval(ft)
        rows.append(("torch", epoch, *d, p))
        print(f"[torch finetune {epoch}/{ft_epochs}] "
              f"WT {d[0]:.4f} TC {d[1]:.4f} ET {d[2]:.4f} PSNR {p:.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # trained weights for the transplant route (round-4 VERDICT #8): our
    # eval stack can load these via utils/torch_import and demonstrate
    # missing-modality degradation with reference-trained weights
    torch.save(ft.state_dict(),
               os.path.join(ROOT, "runs", "torch_control_et_model.pt"))

    # final 15-subset sweep (reference test.py:78-102 semantics at
    # patch == volume): graceful-degradation evidence at matched scale
    ft.eval()
    with torch.no_grad():
        for idx in range(15):
            xz = xv.clone()
            for mod in range(4):  # zero dropped inputs, evaluation.py:306-307
                if mod not in ra.SUBSETS_MODALITIES[idx]:
                    xz[:, mod] = 0.0
            seg, _ = ft(xz, [idx], valid=True)
            d = hard_dice(seg.numpy(), mv)
            subset_rows.append(("torch", idx, *d))
            print(f"[torch subset {idx}] WT {d[0]:.4f} TC {d[1]:.4f} "
                  f"ET {d[2]:.4f}", flush=True)


# ------------------------------------------------------------------ jax side

def run_jax(xt, mt, xv, mv, pre_epochs, ft_epochs, rows, subset_rows,
            init_scheme="default"):
    label = "jax" if init_scheme == "default" else f"jax_{init_scheme}init"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.engine.checkpoint import surgical_restore
    from xlstm_hved_tpu.engine.train import (create_train_state,
                                             freeze_mask_for,
                                             make_pretrain_step,
                                             make_train_step)
    from xlstm_hved_tpu.models import Discriminator, find_model_using_name

    # channel-last layout
    xt_j = jnp.asarray(np.moveaxis(xt, 1, -1))
    mt_j = jnp.asarray(np.moveaxis(mt, 1, -1))
    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))

    t0 = time.time()
    disc = Discriminator(f_maps=64, kernel=4, dtype=jnp.float32)

    pre_model = find_model_using_name("XLSTM_HVED", shared_recon=False,
                                      compute_dtype="float32")
    cfg_pre = TrainConfig(crop_size=SHAPE, num_epochs=pre_epochs)
    state, _ = create_train_state(pre_model, disc, cfg_pre,
                                  jax.random.PRNGKey(0), xt_j[:1], N_TRAIN,
                                  init_scheme=init_scheme)
    freeze = freeze_mask_for(state.params_g, ("sdecoder",))
    pstep = jax.jit(make_pretrain_step(pre_model, cfg_pre, N_TRAIN,
                                       freeze_mask=freeze))
    rng = jax.random.PRNGKey(42)
    for epoch in range(1, pre_epochs + 1):
        for i in range(N_TRAIN):
            rng, k = jax.random.split(rng)
            state, metrics = pstep(state, xt_j[i:i + 1], k)
        print(f"[jax pretrain {epoch}/{pre_epochs}] "
              f"loss {float(metrics['loss']):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    ft_model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    cfg_ft = TrainConfig(crop_size=SHAPE, num_epochs=ft_epochs)
    ft_state, _ = create_train_state(ft_model, disc, cfg_ft,
                                     jax.random.PRNGKey(1), xt_j[:1], N_TRAIN,
                                     init_scheme=init_scheme)
    merged, loaded, skipped = surgical_restore(ft_state.params_g,
                                               state.params_g)
    ft_state = ft_state.replace(params_g=merged,
                                batch_stats_g=state.batch_stats_g)
    print(f"[jax surgery] loaded {len(loaded)} skipped {len(skipped)}",
          flush=True)

    tstep = jax.jit(make_train_step(ft_model, disc, cfg_ft, N_TRAIN))
    fwd = jax.jit(lambda v, x: ft_model.apply(
        v, x, keep=jnp.ones((1, 4), jnp.float32), recon=True,
        deterministic=True))
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
        p = float(10 * np.log10(
            1.0 / np.mean((rec - np.asarray(xv_j)) ** 2)))
        rows.append((label, epoch, *d, p))
        print(f"[{label} finetune {epoch}/{ft_epochs}] "
              f"WT {d[0]:.4f} TC {d[1]:.4f} ET {d[2]:.4f} PSNR {p:.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # final 15-subset sweep (keep as a traced arg: one compile for all 15)
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS
    mvars = {"params": ft_state.params_g}
    if ft_state.batch_stats_g:
        mvars["batch_stats"] = ft_state.batch_stats_g
    sweep_fwd = jax.jit(lambda v, x, k: ft_model.apply(
        v, x, keep=k, recon=False, deterministic=True).seg)
    for idx in range(15):
        keep = jnp.asarray(SUBSET_MASKS[idx], jnp.float32)
        xz = xv_j * keep[None, None, None, None, :]
        seg = np.moveaxis(
            np.asarray(sweep_fwd(mvars, xz, keep), np.float32), -1, 1)
        d = hard_dice(seg, mv)
        subset_rows.append((label, idx, *d))
        print(f"[{label} subset {idx}] WT {d[0]:.4f} TC {d[1]:.4f} "
              f"ET {d[2]:.4f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pre_epochs", type=int, default=8)
    ap.add_argument("--ft_epochs", type=int, default=24)
    ap.add_argument("--impl", choices=("torch", "jax", "both"),
                    default="both")
    ap.add_argument("--jax_init", default="default",
                    choices=("default", "reference"))
    args = ap.parse_args()

    xt, mt = make_data(N_TRAIN, seed=0)
    xv, mv = make_data(N_VALID, seed=1000)
    print(f"data: train {xt.shape}, valid {xv.shape}; ET fraction "
          f"{mt[:, 2].mean():.4f} of volume, "
          f"{mt[:, 2].sum() / mt[:, 0].sum():.3f} of tumor", flush=True)

    rows, subset_rows = [], []
    try:
        if args.impl in ("jax", "both"):
            run_jax(xt, mt, xv, mv, args.pre_epochs, args.ft_epochs, rows,
                    subset_rows, init_scheme=args.jax_init)
        if args.impl in ("torch", "both"):
            run_torch(xt, mt, xv, mv, args.pre_epochs, args.ft_epochs, rows,
                      subset_rows)
    finally:
        out = os.path.join(ROOT, "docs", "fullscale", "torch_control_et.csv")
        mode = "a" if os.path.exists(out) else "w"
        with open(out, mode, newline="") as f:
            w = csv.writer(f)
            if mode == "w":
                w.writerow(["impl", "epoch", "wt", "tc", "et", "psnr_f"])
            w.writerows(rows)
        print(f"wrote {out} ({len(rows)} rows)")
        out2 = os.path.join(ROOT, "docs", "fullscale",
                            "torch_control_et_subsets.csv")
        mode = "a" if os.path.exists(out2) else "w"
        with open(out2, mode, newline="") as f:
            w = csv.writer(f)
            if mode == "w":
                w.writerow(["impl", "subset_idx", "wt", "tc", "et"])
            w.writerows(subset_rows)
        print(f"wrote {out2} ({len(subset_rows)} rows)")


if __name__ == "__main__":
    main()
