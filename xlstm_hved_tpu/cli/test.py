"""15-subset missing-modality evaluation entry point (re-design of
/root/reference/test.py:40-102 + evaluation.py:279-498): sliding-window
whole-volume inference swept over all 15 modality subsets in chunked-vmapped
device passes, reporting Dice WT/TC/ET (+ optional HD95) per subset and the
running average, with optional NIfTI prediction export (label remap
WT->2/TC->1/ET->4)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.cli.common import base_parser, print_args
from xlstm_hved_tpu.data.brats import BraTSDataset
from xlstm_hved_tpu.data.nifti import write_nifti
from xlstm_hved_tpu.data.transforms import device_eval_transform
from xlstm_hved_tpu.engine.checkpoint import CheckpointManager
from xlstm_hved_tpu.engine.evaluate import (
    default_apply_fn,
    label_volume_from_probs,
    make_hoisted_subset_sweep,
    make_subset_sweep,
)
from xlstm_hved_tpu.engine.train import create_train_state
from xlstm_hved_tpu.config import TrainConfig
from xlstm_hved_tpu.metrics import dice_region, hd95_region
from xlstm_hved_tpu.models import Discriminator, find_model_using_name
from xlstm_hved_tpu.utils.subsets import SUBSETS_MODALITIES


def main(argv=None):
    parser = base_parser("15-subset missing-modality evaluation")
    parser.add_argument("--ckpt", type=str, default="best_dice")
    parser.add_argument("--compute_hd95", action="store_true")
    parser.add_argument("--save_pred_dir", type=str, default="")
    parser.add_argument("--eval_recon", action="store_true",
                        help="also sweep reconstruction (PSNR/SSIM per "
                             "subset; eval_overlap_recon equivalent)")
    parser.add_argument("--save_plots_dir", type=str, default="",
                        help="dump mid-slice segmentation overlays (PNG)")
    args = parser.parse_args(argv)
    print_args(args)

    validset = BraTSDataset(args.valid_dir, m_full=True, seed=0)
    cfg = TrainConfig(crop_size=tuple(args.crop_size))
    model = find_model_using_name(args.model_name,
                                  compute_dtype=args.compute_dtype)
    disc = Discriminator(f_maps=args.disc_fmaps, kernel=args.disc_kernel,
                         dtype=jnp.bfloat16 if args.disc_dtype == "bfloat16"
                         else jnp.float32)
    sample = jnp.zeros((1, *cfg.crop_size, 4), jnp.float32)
    state, _ = create_train_state(model, disc, cfg, jax.random.PRNGKey(0),
                                  sample)
    ckpt = CheckpointManager(f"{args.out_dir}/{args.model_name}")
    if ckpt.exists(args.ckpt):
        state, _meta = ckpt.restore(args.ckpt, state)
        print(f"restored checkpoint {args.ckpt}")
    else:
        print(f"WARNING: checkpoint {args.ckpt} not found; evaluating "
              "randomly-initialized weights")

    variables = {"params": state.params_g}
    if state.batch_stats_g:
        variables["batch_stats"] = state.batch_stats_g
    model_cfg = getattr(model, "cfg", None)
    if model_cfg is not None and model_cfg.mvae and not model_cfg.fusion:
        # hoisted sweep: the subset-invariant forward prefix runs once per
        # window instead of 15x (exact — tests/test_engine.py)
        sweep = make_hoisted_subset_sweep(
            model, patch=cfg.crop_size, stride=cfg.crop_size,
            recon_channels=4 if args.eval_recon else 0)
    else:
        sweep = make_subset_sweep(
            default_apply_fn(model, recon=args.eval_recon),
            patch=cfg.crop_size, stride=cfg.crop_size, subset_chunk=5,
            recon_channels=4 if args.eval_recon else 0)

    n_sub = len(SUBSETS_MODALITIES)
    dice_sums = np.zeros((n_sub, 3))
    hd_sums = np.zeros((n_sub, 3))
    psnr_sums = np.zeros(n_sub)
    ssim_sums = np.zeros(n_sub)
    count = 0
    for i in range(len(validset)):
        item = validset.load(i)
        if item is None:
            continue
        img, labels, _keep, _bg = item
        x, mask = device_eval_transform(jnp.asarray(img), jnp.asarray(labels),
                                        crop=tuple(cfg.crop_size))
        if args.eval_recon:
            segs, recons = sweep(variables, x[None])
            segs = np.asarray(segs)
            recons_j = recons
        else:
            segs = np.asarray(sweep(variables, x[None]))  # (15, 1, ..., 3)
            recons_j = None
        mask_np = np.asarray(mask)[None]
        for s in range(n_sub):
            for r, region in enumerate(("WT", "TC", "EC")):
                dice_sums[s, r] += float(
                    dice_region(jnp.asarray(segs[s]), jnp.asarray(mask_np),
                                region))
                if args.compute_hd95:
                    hd_sums[s, r] += hd95_region(segs[s], mask_np, region)
        if args.eval_recon:
            from xlstm_hved_tpu.metrics import psnr, ssim3d
            for si in range(n_sub):
                psnr_sums[si] += float(psnr(recons_j[si], x[None]))
                ssim_sums[si] += float(ssim3d(recons_j[si], x[None]))
        if args.save_plots_dir:
            from xlstm_hved_tpu.utils.visualize import plot_segm
            plot_segm(args.save_plots_dir, validset.subjects[i],
                      np.asarray(x), segs[-1][0], np.asarray(mask))
        if args.save_pred_dir:
            os.makedirs(args.save_pred_dir, exist_ok=True)
            lab = label_volume_from_probs(segs[-1][0])
            write_nifti(os.path.join(
                args.save_pred_dir,
                f"{validset.subjects[i]}-pred.nii.gz"), lab)
        count += 1

    print(f"\n=== {count} volumes, Dice (WT / TC / ET) per subset ===")
    for s, subset in enumerate(SUBSETS_MODALITIES):
        d = dice_sums[s] / max(count, 1)
        row = f"subset {s:2d} {str(subset):18s} {d[0]:.4f} {d[1]:.4f} {d[2]:.4f}"
        if args.compute_hd95:
            h = hd_sums[s] / max(count, 1)
            row += f"   HD95 {h[0]:7.2f} {h[1]:7.2f} {h[2]:7.2f}"
        if args.eval_recon:
            row += (f"   PSNR {psnr_sums[s]/max(count,1):6.2f}"
                    f" SSIM {ssim_sums[s]/max(count,1):.4f}")
        print(row)
    avg = dice_sums.mean(axis=0) / max(count, 1)
    print(f"average{'':14s} {avg[0]:.4f} {avg[1]:.4f} {avg[2]:.4f}")


if __name__ == "__main__":
    main()
