"""Forward-parity vs torch at three states: (a) torch default init,
(b) init_weights applied (no training), (c) init_weights + 8-epoch
pretrain + surgery. Locates whether the 7e-2 divergence is triggered by
the init DISTRIBUTION or by TRAINING. CPU-only."""
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


def compare(tag, ft_sd, xv):
    import torch

    from ref_loader import load_reference
    ra = load_reference()
    tmodel = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                           shared_recon=True, recon_skip=True,
                           MVAE_reduction=True, final_sigmoid=True,
                           f_maps=4, layer_order="ilc")
    tmodel.load_state_dict(ft_sd)
    tmodel.eval()
    with torch.no_grad():
        tseg, (tmu, _), _ = tmodel(torch.from_numpy(xv), [14], valid=True,
                                   recon=True)

    import jax
    import jax.numpy as jnp

    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.torch_import import hved_params_from_torch

    model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params_g, stats_g = hved_params_from_torch(ft_sd, model.cfg)
    variables = {"params": params_g}
    if stats_g:
        variables["batch_stats"] = stats_g
    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))
    out = jax.jit(lambda v, x: model.apply(
        v, x, keep=jnp.ones((1, 4), jnp.float32), recon=True,
        deterministic=True))(variables, xv_j)
    for lvl, jm in enumerate(out.mu):
        jm_t = np.moveaxis(np.asarray(jm, np.float32), -1, 2)
        print(f"{tag}: level {lvl} mu maxerr "
              f"{np.max(np.abs(jm_t - tmu[lvl].numpy())):.3e}", flush=True)
    jseg = np.moveaxis(np.asarray(out.seg, np.float32), -1, 1)
    print(f"{tag}: seg maxerr {np.max(np.abs(jseg - tseg.numpy())):.3e}",
          flush=True)


def main():
    import importlib

    import torch

    import jax
    jax.config.update("jax_platforms", "cpu")
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()

    from ref_loader import load_reference
    ra = load_reference()
    utils_mod = importlib.import_module("utils")

    xt, _ = make_data(N_TRAIN, seed=0)
    xv, _ = make_data(N_VALID, seed=1000)

    torch.manual_seed(0)
    m_default = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                              shared_recon=True, recon_skip=True,
                              MVAE_reduction=True, final_sigmoid=True,
                              f_maps=4, layer_order="ilc")
    compare("default-init", {k: v.clone() for k, v in
                             m_default.state_dict().items()}, xv)

    m_default.apply(utils_mod.init_weights)
    compare("init_weights", {k: v.clone() for k, v in
                             m_default.state_dict().items()}, xv)

    ft_sd, _ = torch_surgery_state(xt, pre_epochs=8)
    compare("pretrained", ft_sd, xv)


if __name__ == "__main__":
    main()
