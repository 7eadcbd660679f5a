"""Main training entry point (re-design of /root/reference/train.py:68-450).

Capabilities kept: adversarial seg+recon training with modality-subset
dropout, per-epoch validation (full + instance-missing), CSV metric log,
latest/best_vloss/best_dice/backup checkpoints, pretrained-weight surgery,
resume-from-latest.

TPU-native mechanics: one jitted train step (G+D updates inside), on-device
augmentation, data-parallel mesh sharding of the batch, threaded prefetch
instead of DataLoader workers.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.cli.common import (
    assemble_eval_batch,
    assemble_train_batch,
    base_parser,
    make_datasets,
    maybe_init_distributed,
    print_args,
    train_cfg_from_args,
)
from xlstm_hved_tpu.data.brats import prefetch_loader
from xlstm_hved_tpu.engine.checkpoint import CheckpointManager, surgical_restore
from xlstm_hved_tpu.engine.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from xlstm_hved_tpu.models import Discriminator, find_model_using_name
from xlstm_hved_tpu.parallel.mesh import (
    allreduce_averages,
    make_mesh,
    replicate,
    shard_batch,
)
from xlstm_hved_tpu.utils.logging import CSVLogger, RunningAverage, profiler_trace

CSV_FIELDS = [
    "Epoch", "Train_Loss", "Train_dice", "Train_wt_dice", "Train_tc_dice",
    "Train_ec_dice", "Train_recon", "Train_kld", "Train_g_gan",
    "Train_loss_d", "Valid_Loss", "Valid_dice", "Valid_wt_dice",
    "Valid_tc_dice", "Valid_ec_dice", "Valid_wt_dice_m", "Valid_tc_dice_m",
    "Valid_ec_dice_m", "Valid_PSNR_f", "Valid_PSNR_m",
]


def main(argv=None):
    args = base_parser("Train a model (TPU-native XLSTM-HVED)").parse_args(argv)
    proc_id, proc_count = maybe_init_distributed(args)
    is_main = proc_id == 0
    if is_main:
        print_args(args)
    rng = jax.random.PRNGKey(args.seed)

    trainset, validset = make_datasets(args)
    steps_per_epoch = max(len(trainset) // args.train_batch, 1)
    cfg = train_cfg_from_args(args, steps_per_epoch)

    model = find_model_using_name(args.model_name,
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

    ckpt = CheckpointManager(f"{args.out_dir}/{args.model_name}",
                             backup_interval=args.backup_interval)
    if args.pretrain_weights:
        # templateless restore: the pretrain net's param tree is a strict
        # subset of the flagship's (shared_recon=False drops rfinal_*), so
        # a templated restore would fail tree matching; surgery only needs
        # the raw donor tree (torch load_state_dict(strict=False) analog,
        # reference utils.py:122-139).
        donor, _meta = CheckpointManager(args.pretrain_weights).restore_raw(
            "best_vloss")
        merged, loaded, skipped = surgical_restore(
            state.params_g, donor["params_g"], verbose=True)
        state = state.replace(params_g=merged)
    state, epoch_start, best_vloss, best_dice = ckpt.load_or_initialize(state)

    # args.train_batch is per-host; the mesh spans all global devices
    global_batch = max(args.train_batch * proc_count, 1)
    n_dev = args.num_data_devices or len(jax.devices())
    n_dev = min(n_dev, len(jax.devices()), global_batch)
    mesh = make_mesh(data=n_dev)
    data_shard = (proc_id, proc_count) if proc_count > 1 else None
    train_step = make_train_step(model, disc, cfg, steps_per_epoch)
    eval_step = make_eval_step(model)
    csvlog = CSVLogger(f"{args.out_dir}/{args.model_name}/loss_and_metrics.csv",
                       CSV_FIELDS)

    # bounded process chunk: stop (checkpointed) after --stop_after_epoch
    # while the LR schedule keeps the full --num_epochs horizon
    end_epoch = (min(args.num_epochs, args.stop_after_epoch)
                 if args.stop_after_epoch else args.num_epochs)

    with mesh, profiler_trace(args.profile_dir or None):
        state = replicate(mesh, state)
        for epoch in range(epoch_start, end_epoch + 1):
            t0 = time.perf_counter()
            tr = {k: RunningAverage() for k in
                  ("loss", "train_dice", "wt_dice", "tc_dice", "ec_dice",
                   "recon", "kld", "g_gan", "loss_d")}
            for items in prefetch_loader(trainset, args.train_batch,
                                         shuffle=True, seed=args.seed + epoch,
                                         shard=data_shard):
                rng, k_aug, k_step = jax.random.split(rng, 3)
                x, _xm, mask = assemble_train_batch(items, cfg.crop_size, k_aug)
                if cfg.use_sdm:
                    from xlstm_hved_tpu.data.sdm import compute_sdm
                    sdm = jnp.asarray(
                        compute_sdm(np.asarray(mask) > 0.5))
                    x, mask, sdm = shard_batch(mesh, (x, mask, sdm))
                    state, metrics = train_step(state, x, mask, k_step, sdm)
                else:
                    x, mask = shard_batch(mesh, (x, mask))
                    state, metrics = train_step(state, x, mask, k_step)
                for k in tr:
                    tr[k].update(float(metrics[k]))

            va = {k: RunningAverage() for k in
                  ("vloss", "dice", "wt_dice", "tc_dice", "ec_dice",
                   "wt_dice_m", "tc_dice_m", "ec_dice_m", "psnr_f", "psnr_m")}
            did_validate = epoch < 5 or (epoch + 1) % args.validate_every == 0
            if did_validate:
                for items in prefetch_loader(validset, args.valid_batch,
                                             shuffle=False, seed=0,
                                             shard=data_shard):
                    x, xm, mask = assemble_eval_batch(items, cfg.crop_size)
                    x, xm, mask = shard_batch(mesh, (x, xm, mask))
                    m = eval_step(state.params_g, state.batch_stats_g, x, xm,
                                  mask)
                    for k in va:
                        va[k].update(float(m[k]))

            # Cross-host mean of per-shard metrics: every process sees the
            # same global numbers, so best-checkpoint decisions agree.
            trg = allreduce_averages(tr)
            vag = allreduce_averages(va) if did_validate else {}
            vloss = vag["vloss"] if did_validate else None
            vdice = vag["dice"] if did_validate else None
            if is_main:
                best_vloss, best_dice = ckpt.save_epoch(
                    state, epoch, vloss, vdice, best_vloss, best_dice)
            else:  # track bests without rank-0's checkpoint I/O
                if did_validate:
                    best_vloss = min(best_vloss, vloss)
                    best_dice = max(best_dice, vdice)
                continue
            row = {
                "Epoch": epoch, "Train_Loss": trg["loss"],
                "Train_dice": trg["train_dice"],
                "Train_wt_dice": trg["wt_dice"],
                "Train_tc_dice": trg["tc_dice"],
                "Train_ec_dice": trg["ec_dice"],
                "Train_recon": trg["recon"], "Train_kld": trg["kld"],
                "Train_g_gan": trg["g_gan"], "Train_loss_d": trg["loss_d"],
            }
            if did_validate:
                row.update({
                    "Valid_Loss": vloss, "Valid_dice": vdice,
                    "Valid_wt_dice": vag["wt_dice"],
                    "Valid_tc_dice": vag["tc_dice"],
                    "Valid_ec_dice": vag["ec_dice"],
                    "Valid_wt_dice_m": vag["wt_dice_m"],
                    "Valid_tc_dice_m": vag["tc_dice_m"],
                    "Valid_ec_dice_m": vag["ec_dice_m"],
                    "Valid_PSNR_f": vag["psnr_f"],
                    "Valid_PSNR_m": vag["psnr_m"],
                })
            csvlog.append(row)
            vtxt = (f"vloss {vloss:.4f} vdice {vdice:.4f} "
                    f"PSNR_m {vag['psnr_m']:.2f}"
                    if did_validate else "no-val")
            print(f"Epoch [{epoch}/{args.num_epochs}] "
                  f"loss {trg['loss']:.4f} dice {trg['train_dice']:.4f} "
                  f"{vtxt} ({time.perf_counter()-t0:.1f}s)")


if __name__ == "__main__":
    main()
