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
import subprocess
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


def run_cli(module: str, argv, tee_path: str | None = None,
            retries: int = 1) -> None:
    """Run one protocol phase as a bounded subprocess.

    Process isolation is load-bearing, not hygiene: the tunneled-TPU relay
    client retains a host-side copy of every uploaded buffer (~60 MB per
    train step at the reference crop — measured 130 GB anon-rss after ~110
    epochs, at which point the host kernel OOM-kills the process; the same
    loop is RSS-flat on the CPU backend, so the retention is in the relay
    frontend, not this code). Every phase resumes from its checkpoints, so
    a relay transient gets `retries` fresh attempts.
    """
    cmd = [sys.executable, "-m", module, *map(str, argv)]
    for attempt in range(retries + 1):
        if tee_path is None:
            rc = subprocess.run(cmd, check=False).returncode
        else:
            with open(tee_path, "w") as tf, subprocess.Popen(
                    cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True) as p:
                for line in p.stdout:
                    sys.stdout.write(line)
                    sys.stdout.flush()
                    tf.write(line)
                rc = p.wait()
        if rc == 0:
            return
        print(f"[phase] {module} exited rc={rc} "
              f"(attempt {attempt + 1}/{retries + 1})", flush=True)
    raise subprocess.CalledProcessError(rc, cmd)


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
    ap.add_argument("--epoch_chunk", type=int, default=25,
                    help="finetune epochs per training subprocess (bounds "
                         "the relay client's host-buffer growth; see "
                         "run_cli). 0 = one process for all epochs")
    ap.add_argument("--inprocess", action="store_true",
                    help="run phases in this process instead of "
                         "subprocesses (implied by --quick: CPU smoke runs "
                         "don't leak and save 3 interpreter+jax startups)")
    ap.add_argument("--subprocess", dest="force_subprocess",
                    action="store_true",
                    help="force subprocess phases even with --quick (tests "
                         "the chunked-resume orchestration itself)")
    ap.add_argument("--out_root", default=RUNS,
                    help="artifact root (default runs/fullscale); point "
                         "elsewhere to smoke-test beside a live run")
    ap.add_argument("--shape", type=int, nargs=3, default=None,
                    help="synthetic volume D H W (default 160 224 160; "
                         "must exceed --crop so random-crop has slack)")
    ap.add_argument("--crop", type=int, nargs=3, default=None,
                    help="training/eval crop D H W (default the reference "
                         "protocol 128 192 128, train.py:121); smaller "
                         "crops trade protocol fidelity for compile+step "
                         "time when the compile cache is cold")
    args = ap.parse_args()
    runs = args.out_root
    os.makedirs(runs, exist_ok=True)

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
    if args.shape is not None:
        shape = tuple(args.shape)
    if args.crop is not None:
        crop = tuple(args.crop)

    data_root = os.path.join(runs, "data")
    counts = ensure_dataset(data_root, n_train, n_valid, shape)

    common = [
        "--train_dir", os.path.join(data_root, "train"),
        "--valid_dir", os.path.join(data_root, "valid"),
        "--crop_size", *map(str, crop),
        "--model_name", args.model_name,
        "--out_dir", runs,
        "--disc_kernel", str(disc_kernel),
        "--remat",
        "--validate_every", "5",
    ]

    inprocess = ((args.inprocess or args.quick)
                 and not args.force_subprocess)

    # cli/pretrain.py appends "_pretrain" to the checkpoint root itself
    pre_dir = os.path.join(runs, f"{args.model_name}_pretrain")
    table_path = os.path.join(runs, "subset_table.txt")
    test_argv = (common + ["--ckpt", "best_dice", "--eval_recon"]
                 + (["--compute_hd95"] if args.compute_hd95 else []))

    t0 = time.time()
    print(f"[phase 1/3] MVAE pretrain {pre_epochs} epochs", flush=True)
    if inprocess:
        from xlstm_hved_tpu.cli import pretrain as cli_pretrain
        cli_pretrain.main(common + ["--num_epochs", str(pre_epochs)])
    else:
        run_cli("xlstm_hved_tpu.cli.pretrain",
                common + ["--num_epochs", str(pre_epochs)])
    t1 = time.time()
    print(f"[phase 1/3] done in {t1-t0:.0f}s", flush=True)

    print(f"[phase 2/3] adversarial finetune {tr_epochs} epochs", flush=True)
    train_argv = common + ["--num_epochs", str(tr_epochs),
                           "--pretrain_weights", pre_dir]
    if inprocess:
        from xlstm_hved_tpu.cli import train as cli_train
        cli_train.main(train_argv)
    else:
        chunk = args.epoch_chunk if args.epoch_chunk > 0 else tr_epochs
        for stop in range(chunk, tr_epochs + chunk, chunk):
            stop = min(stop, tr_epochs)
            # each chunk resumes from the latest checkpoint; a chunk whose
            # epochs are already done is a fast no-op
            run_cli("xlstm_hved_tpu.cli.train",
                    train_argv + ["--stop_after_epoch", str(stop)])
            if stop == tr_epochs:
                break
    t2 = time.time()
    print(f"[phase 2/3] done in {t2-t1:.0f}s", flush=True)

    print("[phase 3/3] 15-subset eval sweep", flush=True)
    if inprocess:
        from xlstm_hved_tpu.cli import test as cli_test

        class _Tee:
            def __init__(self, *streams):
                self.streams = streams

            def write(self, s):
                for st in self.streams:
                    st.write(s)

            def flush(self):
                for st in self.streams:
                    st.flush()

        with open(table_path, "w") as tf:
            stdout, sys.stdout = sys.stdout, _Tee(sys.stdout, tf)
            try:
                cli_test.main(test_argv)
            finally:
                sys.stdout = stdout
    else:
        run_cli("xlstm_hved_tpu.cli.test", test_argv, tee_path=table_path)
    print(f"[phase 3/3] done in {time.time()-t2:.0f}s; artifacts in {runs}",
          flush=True)
    summary = {
        "crop": crop,
        "n_train": counts["train"], "n_valid": counts["valid"],
        "pretrain_epochs": pre_epochs, "train_epochs": tr_epochs,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(runs, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
