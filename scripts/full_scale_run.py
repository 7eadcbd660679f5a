"""Full-protocol training run at reference scale (round-1 VERDICT #4).

Reproduces the reference training recipe end-to-end on one TPU chip at the
reference crop size (128x192x128, /root/reference/train.py:121):

  1. materialize a realistic synthetic BraTS-layout dataset (volumes larger
     than the crop, nested tumor labels, 4 modalities);
  2. MVAE pretrain (reference Pretrain.py protocol);
  3. weight surgery into the flagship + adversarial seg+recon finetune
     (reference train.py --pretrain_weights protocol);
  4. 15-subset missing-modality evaluation sweep (reference test.py).

Artifacts: runs/fullscale/<model>/loss_and_metrics.csv (trajectory),
runs/fullscale/subset_table.md (per-subset Dice table for docs/).

Usage: python scripts/full_scale_run.py [--quick]  (--quick shrinks every
phase to smoke-test the orchestration itself; the real run takes ~1-2 h).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNS = os.path.join(ROOT, "runs", "fullscale")


def ensure_dataset(root: str, n_train: int, n_valid: int, shape) -> dict:
    """Materialize the synthetic dataset; returns actual per-split counts.

    Only SYN-* subject directories count toward "already present" (stray
    files don't), and the returned counts are what summary.json records so
    the log always reflects the subjects actually used.
    """
    from xlstm_hved_tpu.data.synthetic import write_synthetic_dataset

    counts = {}
    for split, n, seed in (("train", n_train, 0), ("valid", n_valid, 1000)):
        d = os.path.join(root, split)
        existing = ([e for e in os.listdir(d) if e.startswith("SYN-")]
                    if os.path.isdir(d) else [])
        if len(existing) < n:
            t0 = time.time()
            write_synthetic_dataset(d, n_subjects=n, shape=shape, seed=seed)
            print(f"[data] wrote {n} subjects to {d} "
                  f"in {time.time()-t0:.0f}s", flush=True)
            existing = [e for e in os.listdir(d) if e.startswith("SYN-")]
        counts[split] = len(existing)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes/epochs to smoke-test orchestration")
    ap.add_argument("--model_name", default="XLSTM_HVED")
    ap.add_argument("--pretrain_epochs", type=int, default=10)
    ap.add_argument("--train_epochs", type=int, default=40)
    # None sentinels (not sys.argv sniffing, which misses the --flag=value
    # and abbreviated-prefix forms argparse accepts): explicit flags always
    # win; otherwise --quick shrinks the defaults.
    ap.add_argument("--n_train", type=int, default=None)
    ap.add_argument("--n_valid", type=int, default=None)
    ap.add_argument("--compute_hd95", action="store_true",
                    help="HD95 columns in the eval sweep (protocol default "
                         "in the reference, test.py:101-102)")
    args = ap.parse_args()

    if args.quick:
        shape, crop = (32, 48, 32), (16, 32, 16)
        n_train = args.n_train if args.n_train is not None else 4
        n_valid = args.n_valid if args.n_valid is not None else 2
        pre_epochs, tr_epochs = 1, 2
        disc_kernel = 3
    else:
        shape, crop = (160, 224, 160), (128, 192, 128)
        n_train = args.n_train if args.n_train is not None else 32
        n_valid = args.n_valid if args.n_valid is not None else 8
        pre_epochs, tr_epochs = args.pretrain_epochs, args.train_epochs
        disc_kernel = 4

    data_root = os.path.join(RUNS, "data")
    counts = ensure_dataset(data_root, n_train, n_valid, shape)

    common = [
        "--train_dir", os.path.join(data_root, "train"),
        "--valid_dir", os.path.join(data_root, "valid"),
        "--crop_size", *map(str, crop),
        "--model_name", args.model_name,
        "--out_dir", RUNS,
        "--disc_kernel", str(disc_kernel),
        "--remat",
        "--validate_every", "5",
    ]

    from xlstm_hved_tpu.cli import pretrain as cli_pretrain
    from xlstm_hved_tpu.cli import test as cli_test
    from xlstm_hved_tpu.cli import train as cli_train

    # cli/pretrain.py appends "_pretrain" to the checkpoint root itself
    pre_dir = os.path.join(RUNS, f"{args.model_name}_pretrain")
    t0 = time.time()
    print(f"[phase 1/3] MVAE pretrain {pre_epochs} epochs", flush=True)
    cli_pretrain.main(common + ["--num_epochs", str(pre_epochs)])
    t1 = time.time()
    print(f"[phase 1/3] done in {t1-t0:.0f}s", flush=True)

    print(f"[phase 2/3] adversarial finetune {tr_epochs} epochs", flush=True)
    cli_train.main(common + [
        "--num_epochs", str(tr_epochs),
        "--pretrain_weights", pre_dir,
    ])
    t2 = time.time()
    print(f"[phase 2/3] done in {t2-t1:.0f}s", flush=True)

    print("[phase 3/3] 15-subset eval sweep", flush=True)

    class _Tee:
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)

        def flush(self):
            for st in self.streams:
                st.flush()

    table_path = os.path.join(RUNS, "subset_table.txt")
    with open(table_path, "w") as tf:
        stdout, sys.stdout = sys.stdout, _Tee(sys.stdout, tf)
        try:
            cli_test.main(common + ["--ckpt", "best_dice", "--eval_recon"]
                          + (["--compute_hd95"] if args.compute_hd95 else []))
        finally:
            sys.stdout = stdout
    print(f"[phase 3/3] done in {time.time()-t2:.0f}s; artifacts in {RUNS}",
          flush=True)
    summary = {
        "crop": crop,
        "n_train": counts["train"], "n_valid": counts["valid"],
        "pretrain_epochs": pre_epochs, "train_epochs": tr_epochs,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(RUNS, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
