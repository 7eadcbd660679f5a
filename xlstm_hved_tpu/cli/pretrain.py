"""Recon-decoder pretraining entry point (re-design of
/root/reference/Pretrain.py:79-366): seg branch skipped (seg=False forward),
shared seg decoders frozen, loss = MSE recon + beta*KLD, validation reports
PSNR/SSIM on full and missing inputs. Fixes the reference's NameError on
uninitialized avg_psnr_f (Pretrain.py:284-292, SURVEY.md §4 defect 4)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from xlstm_hved_tpu.cli.common import (
    assemble_eval_batch,
    assemble_train_batch,
    base_parser,
    print_args,
    train_cfg_from_args,
)
from xlstm_hved_tpu.data.brats import BraTSDataset, prefetch_loader
from xlstm_hved_tpu.engine.checkpoint import CheckpointManager
from xlstm_hved_tpu.engine.train import (
    create_train_state,
    freeze_mask_for,
    make_pretrain_step,
)
from xlstm_hved_tpu.metrics import psnr, ssim3d
from xlstm_hved_tpu.models import Discriminator, find_model_using_name
from xlstm_hved_tpu.utils.logging import CSVLogger, RunningAverage

CSV_FIELDS = ["Epoch", "Train_Loss", "Valid_Loss", "PSNR_f", "SSIM_f",
              "PSNR_m", "SSIM_m"]


def main(argv=None):
    parser = base_parser("Pretrain the reconstruction decoder")
    parser.set_defaults(model_name="U_HVEDDuSFEmViLDFNet3D")
    args = parser.parse_args(argv)
    print_args(args)
    rng = jax.random.PRNGKey(args.seed)

    trainset = BraTSDataset(args.train_dir, m_full=False, seed=args.seed)
    validset = BraTSDataset(args.valid_dir, m_full=False, seed=args.seed + 1)
    steps_per_epoch = max(len(trainset) // args.train_batch, 1)
    cfg = train_cfg_from_args(args, steps_per_epoch)

    # per-modality recon decoders during pretraining (shared_recon=False,
    # Pretrain.py:144-145)
    model = find_model_using_name(args.model_name, shared_recon=False,
                                  compute_dtype=args.compute_dtype,
                                  remat=args.remat)
    disc = Discriminator(f_maps=args.disc_fmaps, kernel=args.disc_kernel,
                         dtype=jnp.bfloat16 if args.disc_dtype == "bfloat16"
                         else jnp.float32)
    sample = jnp.zeros((1, *cfg.crop_size, 4), jnp.float32)
    rng, init_rng = jax.random.split(rng)
    state, _ = create_train_state(model, disc, cfg, init_rng, sample,
                                  steps_per_epoch,
                                  init_scheme=args.init_scheme)
    freeze = freeze_mask_for(state.params_g, ("sdecoder",))
    step = make_pretrain_step(model, cfg, steps_per_epoch, freeze_mask=freeze)

    ckpt = CheckpointManager(f"{args.out_dir}/{args.model_name}_pretrain",
                             backup_interval=args.backup_interval)
    state, epoch_start, best_vloss, _ = ckpt.load_or_initialize(state)
    csvlog = CSVLogger(
        f"{args.out_dir}/{args.model_name}_pretrain/loss_and_metrics.csv",
        CSV_FIELDS)

    import functools
    recon_fwd = jax.jit(functools.partial(
        model.apply, seg=False, recon=True, deterministic=True))
    recon_fwd_missing = jax.jit(functools.partial(
        model.apply, seg=False, recon=True, deterministic=True,
        instance_missing=True))

    # bounded process chunk (see --stop_after_epoch in cli/common.py)
    end_epoch = (min(args.num_epochs, args.stop_after_epoch)
                 if args.stop_after_epoch else args.num_epochs)

    for epoch in range(epoch_start, end_epoch + 1):
        t0 = time.perf_counter()
        tr_loss = RunningAverage()
        for items in prefetch_loader(trainset, args.train_batch, shuffle=True,
                                     seed=args.seed + epoch):
            rng, k_aug, k_step = jax.random.split(rng, 3)
            x, _xm, _mask = assemble_train_batch(items, cfg.crop_size, k_aug)
            state, metrics = step(state, x, k_step)
            tr_loss.update(float(metrics["loss"]))

        va = {k: RunningAverage() for k in
              ("vloss", "psnr_f", "ssim_f", "psnr_m", "ssim_m")}
        mvars = {"params": state.params_g}
        if state.batch_stats_g:
            mvars["batch_stats"] = state.batch_stats_g
        for items in prefetch_loader(validset, args.valid_batch,
                                     shuffle=False, seed=0):
            x, xm, _mask = assemble_eval_batch(items, cfg.crop_size)
            out_f = recon_fwd(mvars, x)
            out_m = recon_fwd_missing(mvars, xm)
            va["vloss"].update(float(jnp.mean((out_m.recon - x) ** 2)))
            va["psnr_f"].update(float(psnr(out_f.recon, x)))
            va["ssim_f"].update(float(ssim3d(out_f.recon, x)))
            va["psnr_m"].update(float(psnr(out_m.recon, x)))
            va["ssim_m"].update(float(ssim3d(out_m.recon, x)))

        best_vloss, _ = ckpt.save_epoch(state, epoch, va["vloss"].avg, 0.0,
                                        best_vloss, 0.0)
        csvlog.append({"Epoch": epoch, "Train_Loss": tr_loss.avg,
                       "Valid_Loss": va["vloss"].avg,
                       "PSNR_f": va["psnr_f"].avg, "SSIM_f": va["ssim_f"].avg,
                       "PSNR_m": va["psnr_m"].avg, "SSIM_m": va["ssim_m"].avg})
        print(f"Epoch [{epoch}/{args.num_epochs}] loss {tr_loss.avg:.4f} "
              f"vloss {va['vloss'].avg:.4f} PSNR_m {va['psnr_m'].avg:.2f} "
              f"({time.perf_counter()-t0:.1f}s)")


if __name__ == "__main__":
    main()
