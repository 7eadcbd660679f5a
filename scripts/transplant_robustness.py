"""Missing-modality robustness through OUR eval stack with torch-TRAINED
weights (round-4 VERDICT #8 transplant route).

Loads the reference-chain-trained flagship from the ET control run
(scripts/torch_control_et.py writes runs/torch_control_et_model.pt after
its finetune arm), transplants it with utils/torch_import, and runs the
15-subset sweep through our hoisted eval engine at the control scale
(32^3, patch == volume). Writes docs/fullscale/transplant_subset_table.csv
with per-subset WT/TC/ET hard dice, demonstrating that OUR sweep machinery
reproduces whatever graceful degradation the reference-trained weights
carry (the fusion machinery itself is already transplant-parity-tested in
tests/test_torch_parity.py::test_flagship_parity_all_15_subsets).

Reference behavior being reproduced: /root/reference/test.py:78-102
(per-subset sweep), evaluation.py:306-307 (input zeroing),
RA_HVED.py:588-597 (PoE under missing experts).

CPU-only (runs beside a busy TPU).
"""
from __future__ import annotations

import csv
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SHAPE = (32, 32, 32)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from torch_control_et import N_VALID, hard_dice, make_data
    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS
    from xlstm_hved_tpu.utils.torch_import import hved_params_from_torch

    ckpt = os.path.join(ROOT, "runs", "torch_control_et_model.pt")
    sd = torch.load(ckpt, map_location="cpu")
    jmodel = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params, stats = hved_params_from_torch(sd, jmodel.cfg)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats

    xv, mv = make_data(N_VALID, seed=1000)
    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))

    fwd = jax.jit(lambda v, x, k: jmodel.apply(
        v, x, keep=k, recon=False, deterministic=True).seg)
    rows = []
    for idx in range(15):
        keep = jnp.asarray(SUBSET_MASKS[idx], jnp.float32)
        xz = xv_j * keep[None, None, None, None, :]
        seg = np.moveaxis(np.asarray(fwd(variables, xz, keep), np.float32),
                          -1, 1)
        d = hard_dice(seg, mv)
        rows.append((idx, "".join(str(int(b)) for b in SUBSET_MASKS[idx]),
                     *[round(v, 4) for v in d]))
        print(f"[transplant subset {idx}] keep={rows[-1][1]} "
              f"WT {d[0]:.4f} TC {d[1]:.4f} ET {d[2]:.4f}", flush=True)

    out = os.path.join(ROOT, "docs", "fullscale",
                       "transplant_subset_table.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["subset_idx", "keep_mask", "wt", "tc", "et"])
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
