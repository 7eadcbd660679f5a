"""Diagnostic: why is the ET channel stuck at dice ~0.03 in the protocol run?

Loads the in-flight run's `latest` checkpoint (raw restore — CPU-safe while
the chip trains), forwards one validation subject at a tumor-centred crop,
and prints the ET-channel probability distribution inside/outside the true
ET region, alongside WT/TC for contrast. Distinguishes:
  - saturation stall: ET logits pinned very negative everywhere (probs ~0
    in-region, not rising) -> loss/initialization pathology;
  - slow learner: in-region probs well above out-of-region but below the
    0.5 threshold -> just needs more epochs (hard dice lags soft dice);
  - structural bug: in-region mass placed on the wrong channel/region.
"""
import sys

import jax

# JAX_PLATFORMS env is overridden by the axon sitecustomize registration in
# this container; the only reliable CPU pin is the in-process config (same
# as tests/conftest.py). Must run before any backend use.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from xlstm_hved_tpu.data.brats import BraTSDataset
from xlstm_hved_tpu.data.transforms import device_eval_transform
from xlstm_hved_tpu.engine.checkpoint import CheckpointManager
from xlstm_hved_tpu.models import find_model_using_name

import os as _os
CKPT_DIR = _os.environ.get("DIAG_CKPT_DIR",
                           "/root/repo/runs/fullscale/XLSTM_HVED")
VALID_DIR = "/root/repo/runs/fullscale/data/valid"
CROP = (64, 96, 64)


def main():
    ds = BraTSDataset(VALID_DIR, m_full=True, seed=0)
    img, labels, _keep, _bg = ds.load(0)
    # tumor-centred crop so ET is guaranteed inside
    et_idx = np.argwhere(labels == 1)
    center = et_idx.mean(axis=0).astype(int)
    origin = [int(np.clip(center[i] - CROP[i] // 2, 0,
                          labels.shape[i] - CROP[i])) for i in range(3)]
    img_c = img[tuple(slice(origin[i], origin[i] + CROP[i])
                      for i in range(3))]
    lab_c = labels[tuple(slice(origin[i], origin[i] + CROP[i])
                         for i in range(3))]
    x, mask = device_eval_transform(jnp.asarray(img_c), jnp.asarray(lab_c),
                                    crop=None)
    mask = np.asarray(mask)
    print("crop ET voxels:", int(mask[..., 2].sum()),
          "TC:", int(mask[..., 1].sum()), "WT:", int(mask[..., 0].sum()),
          "of", mask[..., 0].size)

    model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    ckpt = CheckpointManager(CKPT_DIR)
    raw, _ = ckpt.restore_raw("latest")
    variables = {"params": raw["params_g"],
                 "batch_stats": raw["batch_stats_g"]}

    keep = jnp.ones((1, 4), jnp.float32)
    out = model.apply(variables, x[None], keep, deterministic=True,
                      rngs=None)
    seg = np.asarray(out[0][0], np.float32)  # (D,H,W,3) sigmoid probs
    print("seg shape", seg.shape, "range", seg.min(), seg.max())

    for r, name in enumerate(("WT", "TC", "ET")):
        inside = seg[..., r][mask[..., r] > 0]
        outside = seg[..., r][mask[..., r] == 0]
        pred_n = int((seg[..., r] > 0.5).sum())
        true_n = int(mask[..., r].sum())
        inter = int(((seg[..., r] > 0.5) & (mask[..., r] > 0)).sum())
        dice = 2 * inter / max(pred_n + true_n, 1)
        print(f"{name}: in-region prob mean {inside.mean():.4f} "
              f"p50 {np.median(inside):.4f} p95 {np.percentile(inside,95):.4f}"
              f" max {inside.max():.4f} | out mean {outside.mean():.4f}"
              f" p99 {np.percentile(outside,99):.4f} | pred>0.5 {pred_n}"
              f" true {true_n} inter {inter} dice {dice:.4f}")

    # where does the ET channel put its mass? correlation with other regions
    et_prob = seg[..., 2]
    lab_et = mask[..., 2] > 0
    lab_tc_only = (mask[..., 1] > 0) & ~lab_et
    lab_wt_only = (mask[..., 0] > 0) & (mask[..., 1] == 0)
    bg = mask[..., 0] == 0
    for nm, sel in (("ET(true)", lab_et), ("TC-only", lab_tc_only),
                    ("WT-shell", lab_wt_only), ("background", bg)):
        print(f"ET-channel prob over {nm}: mean {et_prob[sel].mean():.5f} "
              f"max {et_prob[sel].max():.4f}")


if __name__ == "__main__":
    main()
