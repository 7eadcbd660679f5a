"""End-to-end CLI tests on a synthetic BraTS-layout dataset: train 1 epoch
(checkpoints + CSV written), resume, pretrain 1 epoch, and the 15-subset
test sweep. These drive the same code paths a user runs."""
import csv
import os

import numpy as np
import pytest

from xlstm_hved_tpu.data.synthetic import write_synthetic_dataset

SHAPE = (16, 16, 16)
ARGS_COMMON = [
    "--crop_size", "16", "16", "16",
    "--num_epochs", "1",
    "--disc_kernel", "3", "--disc_fmaps", "8",
    "--compute_dtype", "float32",
    "--model_name", "XLSTM_HVED",
]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    train_dir = write_synthetic_dataset(str(root / "train"), 2, SHAPE, seed=0)
    valid_dir = write_synthetic_dataset(str(root / "valid"), 1, SHAPE, seed=1)
    return train_dir, valid_dir


def test_train_cli_one_epoch_and_resume(dataset, tmp_path):
    from xlstm_hved_tpu.cli.train import main

    train_dir, valid_dir = dataset
    out_dir = str(tmp_path / "results")
    argv = ARGS_COMMON + ["--train_dir", train_dir, "--valid_dir", valid_dir,
                          "--out_dir", out_dir]
    main(argv)
    model_dir = os.path.join(out_dir, "XLSTM_HVED")
    assert os.path.isdir(os.path.join(model_dir, "latest"))
    assert os.path.isdir(os.path.join(model_dir, "best_vloss"))
    csv_path = os.path.join(model_dir, "loss_and_metrics.csv")
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2  # header + 1 epoch
    assert float(rows[1][1]) > 0  # finite train loss logged

    # resume: runs epoch 2 only
    argv2 = list(argv)
    argv2[argv2.index("--num_epochs") + 1] = "2"
    main(argv2)
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 3
    assert int(rows[2][0]) == 2


def test_test_cli_subset_sweep(dataset, tmp_path, capsys):
    from xlstm_hved_tpu.cli.test import main

    train_dir, valid_dir = dataset
    out_dir = str(tmp_path / "results")
    pred_dir = str(tmp_path / "preds")
    main(ARGS_COMMON + ["--train_dir", train_dir, "--valid_dir", valid_dir,
                        "--out_dir", out_dir, "--save_pred_dir", pred_dir])
    out = capsys.readouterr().out
    assert "Dice (WT / TC / ET) per subset" in out
    assert sum(1 for l in out.splitlines() if l.startswith("subset ")) == 15
    assert "average" in out
    preds = os.listdir(pred_dir)
    assert len(preds) == 1 and preds[0].endswith("-pred.nii.gz")
    from xlstm_hved_tpu.data.nifti import read_nifti
    lab, _ = read_nifti(os.path.join(pred_dir, preds[0]))
    assert set(np.unique(lab)).issubset({0, 1, 2, 4})


def test_pretrain_cli_one_epoch(dataset, tmp_path):
    from xlstm_hved_tpu.cli.pretrain import main

    train_dir, valid_dir = dataset
    out_dir = str(tmp_path / "results")
    main(ARGS_COMMON + ["--train_dir", train_dir, "--valid_dir", valid_dir,
                        "--out_dir", out_dir])
    pdir = os.path.join(out_dir, "XLSTM_HVED_pretrain")
    assert os.path.isdir(os.path.join(pdir, "latest"))
    with open(os.path.join(pdir, "loss_and_metrics.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2
    psnr_m = float(rows[1][5])
    assert np.isfinite(psnr_m)


def test_test_cli_recon_and_plots(dataset, tmp_path):
    from xlstm_hved_tpu.cli.test import main

    train_dir, valid_dir = dataset
    out_dir = str(tmp_path / "results")
    plots = str(tmp_path / "plots")
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(ARGS_COMMON + ["--train_dir", train_dir, "--valid_dir", valid_dir,
                            "--out_dir", out_dir, "--eval_recon",
                            "--save_plots_dir", plots])
    out = buf.getvalue()
    assert "PSNR" in out and "SSIM" in out
    assert os.path.isdir(plots) and len(os.listdir(plots)) >= 1
