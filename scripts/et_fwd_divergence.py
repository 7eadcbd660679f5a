"""Localize the surgery-state forward divergence (level-0 mu maxerr 7e-2):
compare torch-vs-ours level-0 expert parameters in BOTH BatchNorm modes.

If eval-mode (running stats) diverges but batch-mode matches, the BN
running-stats import/usage is the bug; if both diverge, the weight mapping
or a non-BN numeric is. CPU-only."""
from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from torch_control_et import N_TRAIN, N_VALID, make_data  # noqa: E402
from et_engine_ab import torch_surgery_state  # noqa: E402


def main():
    import torch

    xt, _mt = make_data(N_TRAIN, seed=0)
    xv, _mv = make_data(N_VALID, seed=1000)
    ft_sd, _ = torch_surgery_state(xt, pre_epochs=8)

    from ref_loader import load_reference
    ra = load_reference()
    tmodel = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                           shared_recon=True, recon_skip=True,
                           MVAE_reduction=True, final_sigmoid=True,
                           f_maps=4, layer_order="ilc")
    tmodel.load_state_dict(ft_sd)

    xv_t = torch.from_numpy(xv)
    outs_t = {}
    tmodel.eval()
    with torch.no_grad():
        _, (mu_e, _), _ = tmodel(xv_t, [14], valid=True, recon=True)
    outs_t["eval"] = [m.numpy() for m in mu_e]
    tmodel.train()
    with torch.no_grad():
        _, (mu_b, _), _ = tmodel(xv_t, [14], valid=True, recon=True)
    outs_t["batch"] = [m.numpy() for m in mu_b]

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    from xlstm_hved_tpu.utils.torch_import import hved_params_from_torch

    enable_persistent_cache()
    model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params_g, stats_g = hved_params_from_torch(ft_sd, model.cfg)
    variables = {"params": params_g}
    if stats_g:
        variables["batch_stats"] = stats_g
    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))
    keep = jnp.ones((1, 4), jnp.float32)

    out_eval = jax.jit(lambda v, x: model.apply(
        v, x, keep=keep, recon=True, deterministic=True))(variables, xv_j)
    out_batch, _ = jax.jit(lambda v, x: model.apply(
        v, x, keep=keep, recon=True, deterministic=True, train=True,
        mutable=["batch_stats"]))(variables, xv_j)

    for mode, out in (("eval", out_eval), ("batch", out_batch)):
        for lvl, jm in enumerate(out.mu):
            jm_t = np.moveaxis(np.asarray(jm, np.float32), -1, 2)
            tm = outs_t[mode][lvl]
            print(f"{mode:5s} level {lvl}: mu maxerr "
                  f"{np.max(np.abs(jm_t - tm)):.3e}", flush=True)


if __name__ == "__main__":
    main()
