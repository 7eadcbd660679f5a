"""Debug the jax_torchinit NaN (scripts/et_engine_ab.py): transplant the
torch surgery-point state, then (1) check forward parity vs torch at that
exact state, (2) run single train steps printing every loss component and
scanning params for non-finite leaves after each step.

CPU-only diagnostic.
"""
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

    xt, mt = make_data(N_TRAIN, seed=0)
    xv, mv = make_data(N_VALID, seed=1000)
    ft_sd, disc_sd = torch_surgery_state(xt, pre_epochs=8)

    # torch-side forward at the surgery point
    from ref_loader import load_reference
    ra = load_reference()
    tmodel = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                           shared_recon=True, recon_skip=True,
                           MVAE_reduction=True, final_sigmoid=True,
                           f_maps=4, layer_order="ilc")
    tmodel.load_state_dict(ft_sd)
    tmodel.eval()
    with torch.no_grad():
        tseg, _, trec = tmodel(torch.from_numpy(xv), [14], valid=True,
                               recon=True)
    tseg = tseg.numpy()
    trec = (torch.cat(trec, dim=1) if isinstance(trec, list) else trec).numpy()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.engine.train import (create_train_state, make_grad_fn,
                                             make_train_step)
    from xlstm_hved_tpu.models import Discriminator, find_model_using_name
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    from xlstm_hved_tpu.utils.torch_import import (disc_params_from_torch,
                                                   hved_params_from_torch)

    enable_persistent_cache()
    ft_model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params_g, stats_g = hved_params_from_torch(ft_sd, ft_model.cfg)
    variables = {"params": params_g}
    if stats_g:
        variables["batch_stats"] = stats_g

    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))
    out = jax.jit(lambda v, x: ft_model.apply(
        v, x, keep=jnp.ones((1, 4), jnp.float32), recon=True,
        deterministic=True))(variables, xv_j)
    jseg = np.moveaxis(np.asarray(out.seg, np.float32), -1, 1)
    jrec = np.moveaxis(np.asarray(out.recon, np.float32), -1, 1)
    print(f"forward parity: seg maxerr {np.max(np.abs(jseg - tseg)):.3e} "
          f"recon maxerr {np.max(np.abs(jrec - trec)):.3e}", flush=True)
    print(f"  seg finite: {np.isfinite(jseg).all()} "
          f"recon finite: {np.isfinite(jrec).all()}", flush=True)

    # single-step probe
    disc = Discriminator(f_maps=64, kernel=4, dtype=jnp.float32)
    params_d = disc_params_from_torch(disc_sd, num_levels=4)
    cfg = TrainConfig(crop_size=(32, 32, 32), num_epochs=24)
    xt_j = jnp.asarray(np.moveaxis(xt, 1, -1))
    mt_j = jnp.asarray(np.moveaxis(mt, 1, -1))
    state, _ = create_train_state(ft_model, disc, cfg, jax.random.PRNGKey(1),
                                  xt_j[:1], N_TRAIN)
    state = state.replace(params_g=params_g, batch_stats_g=stats_g,
                          params_d=params_d)
    tstep = jax.jit(make_train_step(ft_model, disc, cfg, N_TRAIN))
    rng = jax.random.PRNGKey(42)
    for step in range(4):
        rng, k = jax.random.split(rng)
        state, metrics = tstep(state, xt_j[step:step + 1],
                               mt_j[step:step + 1], k)
        m = {kk: float(vv) for kk, vv in metrics.items()}
        bad = [p for p, leaf in
               jax.tree_util.tree_leaves_with_path(state.params_g)
               if not np.isfinite(np.asarray(leaf)).all()]
        bad_d = [p for p, leaf in
                 jax.tree_util.tree_leaves_with_path(state.params_d)
                 if not np.isfinite(np.asarray(leaf)).all()]
        print(f"step {step}: metrics={m}", flush=True)
        print(f"  non-finite G leaves: {len(bad)} "
              f"{[jax.tree_util.keystr(p) for p in bad[:5]]}", flush=True)
        print(f"  non-finite D leaves: {len(bad_d)} "
              f"{[jax.tree_util.keystr(p) for p in bad_d[:3]]}", flush=True)
        if bad or bad_d:
            break


if __name__ == "__main__":
    main()
