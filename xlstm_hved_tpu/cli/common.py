"""Shared CLI plumbing: argument surface of the reference entry points
(/root/reference/train.py:34-65, Pretrain.py:35-65, test.py:23-37) and the
host<->device batch assembly."""
from __future__ import annotations

import argparse
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.config import TrainConfig


def base_parser(description: str) -> argparse.ArgumentParser:
    # Every CLI entry point funnels through here before its first jit, so
    # this is the one place to turn on the persistent compilation cache:
    # the protocol orchestrator restarts training as bounded subprocess
    # chunks and each chunk would otherwise pay the full XLA compile again.
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--num_epochs", type=int, default=3000)
    p.add_argument("--n_class", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_adv", type=float, default=0.1)
    p.add_argument("--weight_vae", type=float, default=0.2)
    p.add_argument("--validate_every", type=int, default=1)
    p.add_argument("--save_every", type=int, default=5)
    p.add_argument("--save_dir", default="model")
    p.add_argument("--crop_size", type=int, nargs=3, default=[128, 192, 128])
    p.add_argument("--train_batch", type=int, default=1)
    p.add_argument("--valid_batch", type=int, default=1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--train_dir", type=str, default="data/BraTS2024/train")
    p.add_argument("--valid_dir", type=str, default="data/BraTS2024/test")
    p.add_argument("--backup_interval", type=int, default=5)
    p.add_argument("--out_dir", type=str, default="results")
    p.add_argument("--model_name", type=str, default="XLSTM_HVED")
    p.add_argument("--pretrain_weights", type=str, default="")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num_data_devices", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="jax.profiler trace output dir (empty = off)")
    p.add_argument("--disc_kernel", type=int, default=4,
                   help="discriminator conv kernel (use 3 for crops < 48)")
    p.add_argument("--disc_fmaps", type=int, default=64)
    p.add_argument("--disc_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="discriminator compute dtype; the reference runs D "
                        "under AMP autocast (train.py:218-285), so half "
                        "precision is the faithful default")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize model stages in backward; required "
                        "for the reference 128x192x128 crop on one 16GB chip")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize, shard "
                        "the dataset per host, rank-0-only checkpoints/logs")
    p.add_argument("--coordinator_address", type=str, default="",
                   help="host:port of process 0 (empty = auto-detect on TPU)")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--dataset", type=str, default="brats",
                   choices=["brats", "isles", "brats_valid"],
                   help="brats: per-subject NIfTI dirs; isles: HDF5 with "
                        "Bernoulli(0.5) modality dropout (reference "
                        "ISLESset, BraTSdataset.py:176-273); brats_valid: "
                        "label-free BraTS2018 validation HDF5 (reference "
                        "GBMValidset, BraTSdataset.py:431-593; eval/export "
                        "only)")
    p.add_argument("--h5_path", type=str, default="",
                   help="HDF5 file for --dataset isles / brats_valid")
    p.add_argument("--stop_after_epoch", type=int, default=0,
                   help="stop the epoch loop after this epoch (0 = run to "
                        "--num_epochs) WITHOUT shortening the LR horizon — "
                        "resume-from-latest continues where it stopped. Lets "
                        "an orchestrator run a long training as bounded "
                        "process chunks (the tunneled-TPU relay client "
                        "retains a host copy of every uploaded step batch, "
                        "~60 MB/step at the reference crop, so a multi-hour "
                        "single process is OOM-killed by the host kernel)")
    p.add_argument("--init_scheme", type=str, default="reference",
                   choices=["reference", "default"],
                   help="fresh-start weight init: 'reference' applies the "
                        "protocol's init_weights distribution (kaiming "
                        "kernels, N(0,1) conv biases, utils.py:191-215, "
                        "applied at train.py:145-147); 'default' keeps "
                        "he-normal kernels + zero biases. Ignored on "
                        "checkpoint resume")
    p.add_argument("--sdm", action="store_true",
                   help="add the boundary loss <seg, SDM(gt)> to the "
                        "generator objective (reference optional path, "
                        "loss.py:136-146, utils.py:217-257)")
    p.add_argument("--weight_bd", type=float, default=0.5,
                   help="boundary-loss weight (only with --sdm)")
    return p


def make_datasets(args):
    """(trainset, validset) per --dataset. BraTS: two NIfTI directory sets.
    ISLES: one HDF5 split 80/20 by index (the reference passes explicit
    index lists; a deterministic split keeps the CLI self-contained)."""
    from xlstm_hved_tpu.data.brats import (BraTSDataset, BraTSValidationSet,
                                           ISLESDataset)

    if args.dataset == "brats_valid":
        assert args.h5_path, "--dataset brats_valid requires --h5_path"
        # label-free: both slots get the validation set (only cli/test's
        # prediction/export path makes sense here; metrics vs the zero
        # placeholder masks are as meaningless as the reference's)
        valid = BraTSValidationSet(args.h5_path, seed=args.seed + 1)
        return valid, valid
    if args.dataset == "isles":
        assert args.h5_path, "--dataset isles requires --h5_path"
        import h5py

        with h5py.File(args.h5_path, "r") as f:
            n = len(f["images"])
        split = max(int(n * 0.8), 1)
        train = ISLESDataset(args.h5_path, indices=range(split),
                             m_full=False, seed=args.seed)
        valid = ISLESDataset(args.h5_path, indices=range(split, n),
                             m_full=True, seed=args.seed + 1)
        return train, valid
    return (BraTSDataset(args.train_dir, m_full=True, seed=args.seed),
            BraTSDataset(args.valid_dir, m_full=True, seed=args.seed + 1))


def maybe_init_distributed(args) -> Tuple[int, int]:
    """Returns (process_id, process_count); initializes jax.distributed when
    --distributed is set. Must run before any other jax call in the CLI."""
    if getattr(args, "distributed", False):
        from xlstm_hved_tpu.parallel.mesh import initialize_distributed
        initialize_distributed(
            args.coordinator_address or None,
            args.num_processes or None,
            args.process_id if args.process_id >= 0 else None)
    return jax.process_index(), jax.process_count()


def print_args(args) -> None:
    print("========== arguments ==========")
    for k in vars(args):
        print(f"{k}: {getattr(args, k)}")
    print("===============================")


def train_cfg_from_args(args, steps_per_epoch=None) -> TrainConfig:
    return TrainConfig(
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        weight_decay=1e-5,
        weight_adv=args.weight_adv,
        weight_vae=args.weight_vae,
        use_sdm=getattr(args, "sdm", False),
        weight_bd=getattr(args, "weight_bd", 0.5),
        crop_size=tuple(args.crop_size),
        train_batch=args.train_batch,
        valid_batch=args.valid_batch,
        seed=args.seed,
        validate_every=args.validate_every,
        backup_interval=args.backup_interval,
        steps_per_epoch=steps_per_epoch,
    )


def assemble_train_batch(items: List[Tuple], crop, key: jax.Array):
    """Host batch (list of (img, labels, keep, bg)) -> device (x, x_missing,
    mask). Augmentation runs on HOST (host_augment) so only the crop crosses
    the host->device link — one fp32 (B,*crop,4) + one uint8 (B,*crop,3)
    transfer per step instead of per-item full raw volumes (the full
    160x224x160 volume costs ~10x the crop's transfer time on a
    relay-attached chip). x_missing is derived ON DEVICE from x and the tiny
    keep vector, so it ships nothing."""
    import numpy as np

    from xlstm_hved_tpu.data.transforms import host_augment

    seeds = np.asarray(
        jax.random.randint(key, (len(items),), 0, np.int32(2**31 - 1)))
    xs, keeps, masks = [], [], []
    for i, (img, labels, keep, _bg) in enumerate(items):
        rng = np.random.RandomState(seeds[i])
        x, m = host_augment(rng, img, labels, tuple(crop))
        xs.append(x)
        keeps.append(keep)
        masks.append(m)
    x = jnp.asarray(np.stack(xs))
    mask = jnp.asarray(np.stack(masks)).astype(jnp.float32)  # uint8 on the
    # wire, cast on device
    keep_f = jnp.asarray(np.stack(keeps), jnp.float32)
    xm = x * keep_f[:, None, None, None, :]
    return x, xm, mask


def assemble_eval_batch(items: List[Tuple], crop):
    import numpy as np

    from xlstm_hved_tpu.data.transforms import host_eval_transform

    xs, keeps, masks = [], [], []
    for img, labels, keep, _bg in items:
        x, m = host_eval_transform(img, labels, crop=tuple(crop))
        xs.append(x)
        keeps.append(keep)
        masks.append(m)
    x = jnp.asarray(np.stack(xs))
    mask = jnp.asarray(np.stack(masks)).astype(jnp.float32)
    keep_f = jnp.asarray(np.stack(keeps), jnp.float32)
    xm = x * keep_f[:, None, None, None, :]
    return x, xm, mask
