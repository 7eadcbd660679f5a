"""Reference-native control for the recon-PSNR drop at finetune start
(round-3 VERDICT Weak #1 / Next-round #1): runs the REFERENCE's own torch
code end to end — pretrain (Pretrain.py recipe) -> --pretrain_weights
surgery (train.py + utils.py:102-139 recipe) -> adversarial finetune
(train.py:218-285 recipe) — logging recon PSNR per epoch, to establish
whether the 13.8 dB -> ~0 dB drop at finetune start is the reference
protocol's own behavior or a defect of this framework.

Two executable facts this script pins:

1. The surgery CANNOT carry the output heads across. The pretrain net
   (shared_recon=False, Pretrain.py:144-145) has per-modality 1-channel
   recon heads; the finetune flagship (shared_recon=True, train.py:142-143)
   has one 4-channel head, and its seg head consumes a different channel
   count. torch's load_state_dict raises on size mismatch EVEN with
   strict=False (demonstrated below), which is why the reference carries
   pop lines for exactly rdecoder.finals.0 / srdecoder.rfinals.0 /
   srdecoder.sfinals.0 (utils.py:126-133, commented) — the same heads our
   surgical_restore skips by shape (engine/checkpoint.py:115-137;
   final_conv/rfinal_0/sfinal_0, 5 tensors).

2. With freshly initialized heads, the reference's own finetune starts
   with garbage recon (PSNR ~<=0 dB) and re-learns it slowly under the
   dice-dominated loss mix (dice + m_dice + 0.2*(recon+KLD) + 0.1*GAN),
   i.e. the "recon collapse" in the round-3 committed run reproduces in
   the reference chain by construction.

Scale: tiny (32^3 volumes, few subjects/epochs) — this is a dynamics
control on CPU torch, not a benchmark. Writes
docs/fullscale/torch_control_psnr.csv and prints the trajectory.
"""
from __future__ import annotations

import csv
import os
import sys
import time

import numpy as np
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from ref_loader import load_reference  # noqa: E402

ALPHA, BETA = 0.1, 0.2  # train.py:43-44
LR, WD = 1e-4, 1e-5     # train.py:164-178
SHAPE = (32, 32, 32)
N_TRAIN, N_VALID = 6, 2
PRE_EPOCHS, FT_EPOCHS = 8, 16


def make_data(n, seed):
    """Synthetic volumes + nested WT/TC/ET masks (SegToMask semantics,
    transform.py:255-280), normalized /255 like the train pipeline."""
    from xlstm_hved_tpu.data.synthetic import synthetic_subject

    rng = np.random.RandomState(seed)
    xs, ms = [], []
    for _ in range(n):
        img, labels = synthetic_subject(rng, SHAPE)
        x = img.astype(np.float32) / 255.0
        wt = (labels > 0)
        tc = (labels >= 1) & (labels <= 3)
        et = labels == 1
        m = np.stack([wt, tc, et]).astype(np.float32)
        xs.append(x)
        ms.append(m)
    return (torch.from_numpy(np.stack(xs)), torch.from_numpy(np.stack(ms)))


def build(ra, shared_recon):
    torch.manual_seed(0 if shared_recon else 1)
    return ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                         shared_recon=shared_recon, recon_skip=True,
                         MVAE_reduction=True, final_sigmoid=True,
                         f_maps=4, layer_order="ilc")


def psnr(pred, target):
    mse = torch.mean((pred - target) ** 2)
    return float(10 * torch.log10(1.0 / mse))


def valid_psnr(model, xv):
    model.eval()
    with torch.no_grad():
        _, _, rec = model(xv, [14], valid=True, recon=True, seg=False)
        rec = torch.cat(rec, dim=1) if isinstance(rec, list) else rec
    model.train()
    return psnr(rec, xv)


def _nested_weight(seg):
    """train.py:247-259 without the in-place masked writes."""
    w = torch.where(seg > 0.5, seg, torch.zeros_like(seg))
    nested = w[:, 0].clone()
    for c in (1, 2):
        m = w[:, c] > 0.5
        nested[m] = w[:, c][m]
    return nested


def main():
    import importlib

    ra = load_reference()
    loss_mod = importlib.import_module("loss")
    utils_mod = importlib.import_module("utils")
    dice_loss = loss_mod.DiceLoss()
    gan_loss = loss_mod.GANLoss()
    l2 = torch.nn.MSELoss()

    xt, _mt = make_data(N_TRAIN, seed=0)
    xv, mv = make_data(N_VALID, seed=1000)

    rows = []
    np.random.seed(0)

    # ---- phase 1: pretrain (Pretrain.py:196-366; recon + beta*KLD,
    # sdecoders frozen, per-modality recon decoders)
    pre = build(ra, shared_recon=False)
    for p in pre.srdecoder.sdecoders.parameters():  # Pretrain.py:146-148
        p.requires_grad = False
    opt = torch.optim.Adam(pre.parameters(), lr=LR, weight_decay=WD)
    t0 = time.time()
    for epoch in range(1, PRE_EPOCHS + 1):
        for i in range(N_TRAIN):
            x = xt[i:i + 1]
            subset = utils_mod.subset_idx(np.random.choice(range(1, 4), 1))
            _, _, _f_rec = pre(x, [14], recon=True, seg=False)
            _, (mu, logvar), m_rec = pre(x, subset, recon=True, seg=False)
            m_rec = torch.cat(m_rec, dim=1)
            recon = l2(m_rec, x)
            kld = sum(loss_mod.compute_KLD(mu[j], logvar[j], subset)
                      for j in range(len(mu))) / len(mu)
            loss = recon + BETA * kld
            opt.zero_grad()
            loss.backward()
            opt.step()
        p = valid_psnr(pre, xv)
        rows.append(("pretrain", epoch, p))
        print(f"[pretrain {epoch}/{PRE_EPOCHS}] loss {float(loss):.4f} "
              f"PSNR_f {p:.2f} ({time.time()-t0:.0f}s)", flush=True)

    # ---- phase 2: surgery (utils.py:102-139)
    ft = build(ra, shared_recon=True)
    sd = {k: v.clone() for k, v in pre.state_dict().items()}
    try:
        ft.load_state_dict(sd, strict=False)
        print("UNEXPECTED: strict=False load accepted mismatched heads")
    except RuntimeError as e:
        print("load_state_dict(strict=False) WITH heads raises (as the "
              "reference's pop lines utils.py:126-133 imply):")
        print("  " + str(e).strip().splitlines()[-1])
    # the reference's own (commented) pops — mandatory for the chain to run
    for k in ("rdecoder.finals.0.weight", "rdecoder.finals.0.bias",
              "srdecoder.rfinals.0.weight", "srdecoder.rfinals.0.bias",
              "srdecoder.sfinals.0.weight", "srdecoder.sfinals.0.bias"):
        sd.pop(k, None)
    ret = ft.load_state_dict(sd, strict=False)
    print(f"surgery: missing={sorted(ret.missing_keys)} "
          f"unexpected={len(ret.unexpected_keys)}")
    p0 = valid_psnr(ft, xv)
    rows.append(("post-surgery", 0, p0))
    print(f"[post-surgery, step 0] PSNR_f {p0:.2f}  "
          f"(pretrain ended at {rows[PRE_EPOCHS-1][2]:.2f})", flush=True)

    # ---- phase 3: adversarial finetune (train.py:218-285)
    torch.manual_seed(7)
    disc = ra.Discriminator(in_channels=7, ks=4, strides=[1, 2, 2, 2])
    opt_g = torch.optim.Adam(ft.parameters(), lr=LR, weight_decay=WD)
    opt_d = torch.optim.Adam(disc.parameters(), lr=LR, weight_decay=WD)
    sch_g = torch.optim.lr_scheduler.LambdaLR(
        opt_g, lambda e: (1 - e / FT_EPOCHS) ** 0.9)
    ft.train()
    disc.train()
    for epoch in range(1, FT_EPOCHS + 1):
        for i in range(N_TRAIN):
            x, m = xt[i:i + 1], _mt[i:i + 1]
            subset = utils_mod.subset_idx(np.random.choice(range(1, 4), 1))
            f_out, _, f_rec = ft(x, [14], recon=True)
            m_out, (mu, logvar), m_rec = ft(x, subset, recon=True)
            f_rec = torch.cat(f_rec, dim=1)
            m_rec = torch.cat(m_rec, dim=1)
            dice = dice_loss(f_out, m)
            m_dice = dice_loss(m_out, m)
            recon = l2(m_rec, x)
            kld = sum(loss_mod.compute_KLD(mu[j], logvar[j], subset)
                      for j in range(len(mu))) / len(mu)
            atten_f = f_rec.detach() * (1 + _nested_weight(
                f_out.detach()).unsqueeze(1))
            atten_m = m_rec * (1 + _nested_weight(m_out.detach()).unsqueeze(1))
            g_gan = gan_loss(disc(torch.cat([m_out, atten_m], 1)), True)
            loss = dice + m_dice + BETA * recon + BETA * kld + ALPHA * g_gan
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
        p = valid_psnr(ft, xv)
        rows.append(("finetune", epoch, p))
        print(f"[finetune {epoch}/{FT_EPOCHS}] loss {float(loss):.4f} "
              f"dice {float(dice):.4f} PSNR_f {p:.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    out = os.path.join(ROOT, "docs", "fullscale", "torch_control_psnr.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["phase", "epoch", "psnr_f"])
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
