"""Bisect the non-finite gradient at the torch surgery-point state:
which loss term produces it, which keep-mask triggers it, and where does
the forward diverge from torch (per-level mu/logvar parity + ranges).

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

    from ref_loader import load_reference
    ra = load_reference()
    tmodel = ra.XLSTM_HVED(1, 3, multi_stream=4, fusion_level=4,
                           shared_recon=True, recon_skip=True,
                           MVAE_reduction=True, final_sigmoid=True,
                           f_maps=4, layer_order="ilc")
    tmodel.load_state_dict(ft_sd)
    tmodel.eval()
    with torch.no_grad():
        tseg, (tmu, tlv), trec = tmodel(torch.from_numpy(xv), [14],
                                        valid=True, recon=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.engine.train import create_train_state, _build_loss_g
    from xlstm_hved_tpu.losses import dice_loss, gan_loss_lsgan, l2_loss
    from xlstm_hved_tpu.engine.train import nested_region_weight
    from xlstm_hved_tpu.models import Discriminator, find_model_using_name
    from xlstm_hved_tpu.ops.poe import compute_kld_subsets
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS
    from xlstm_hved_tpu.utils.torch_import import (disc_params_from_torch,
                                                   hved_params_from_torch)

    enable_persistent_cache()
    model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params_g, stats_g = hved_params_from_torch(ft_sd, model.cfg)
    variables = {"params": params_g}
    if stats_g:
        variables["batch_stats"] = stats_g
    xv_j = jnp.asarray(np.moveaxis(xv, 1, -1))

    # ---- per-level mu/logvar parity + ranges (encoder+DRB localization)
    out = jax.jit(lambda v, x: model.apply(
        v, x, keep=jnp.ones((1, 4), jnp.float32), recon=True,
        deterministic=True))(variables, xv_j)
    for lvl, (jm, jl) in enumerate(zip(out.mu, out.logvar)):
        # ours (B,5,*sp,C) -> torch (B,5,C,*sp)
        jm_t = np.moveaxis(np.asarray(jm, np.float32), -1, 2)
        jl_t = np.moveaxis(np.asarray(jl, np.float32), -1, 2)
        tm = tmu[lvl].numpy()
        tl = tlv[lvl].numpy()
        print(f"level {lvl}: mu maxerr {np.max(np.abs(jm_t - tm)):.3e} "
              f"logvar maxerr {np.max(np.abs(jl_t - tl)):.3e} | "
              f"ours logvar [{np.asarray(jl).min():.1f}, "
              f"{np.asarray(jl).max():.1f}] torch "
              f"[{tl.min():.1f}, {tl.max():.1f}]", flush=True)
    jseg = np.moveaxis(np.asarray(out.seg, np.float32), -1, 1)
    print(f"seg maxerr {np.max(np.abs(jseg - tseg.numpy())):.3e}", flush=True)

    # ---- per-term gradient finiteness
    disc = Discriminator(f_maps=64, kernel=4, dtype=jnp.float32)
    params_d = disc_params_from_torch(disc_sd, num_levels=4)
    cfg = TrainConfig(crop_size=(32, 32, 32), num_epochs=24)
    xt_j = jnp.asarray(np.moveaxis(xt, 1, -1))
    mt_j = jnp.asarray(np.moveaxis(mt, 1, -1))
    state, _ = create_train_state(model, disc, cfg, jax.random.PRNGKey(1),
                                  xt_j[:1], N_TRAIN)
    state = state.replace(params_g=params_g, batch_stats_g=stats_g,
                          params_d=params_d)

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x1, m1 = xt_j[:1], mt_j[:1]

    def make_term(term, keep):
        def loss_fn(p):
            mvars = {"params": p}
            if stats_g:
                mvars["batch_stats"] = stats_g
            mut = ["batch_stats"] if stats_g else False
            if mut:
                out_f, _ = model.apply(mvars, x1, recon=True, train=True,
                                       rngs={"latent": k1}, mutable=mut)
                out_m, _ = model.apply(mvars, x1, keep=keep, recon=True,
                                       train=True, rngs={"latent": k2},
                                       mutable=mut)
            else:
                out_f = model.apply(mvars, x1, recon=True, train=True,
                                    rngs={"latent": k1})
                out_m = model.apply(mvars, x1, keep=keep, recon=True,
                                    train=True, rngs={"latent": k2})
            if term == "dice_f":
                return dice_loss(out_f.seg, m1)
            if term == "dice_m":
                return dice_loss(out_m.seg, m1)
            if term == "recon":
                return l2_loss(out_m.recon, x1)
            if term == "kld":
                return jnp.mean(jnp.stack([
                    compute_kld_subsets(mu, lv, keep[None, :])
                    for mu, lv in zip(out_m.mu, out_m.logvar)]))
            if term == "gan":
                m_w = nested_region_weight(jax.lax.stop_gradient(out_m.seg))
                atten_m = out_m.recon * (1.0 + m_w[..., None])
                pred = disc.apply({"params": params_d},
                                  jnp.concatenate([out_m.seg, atten_m],
                                                  axis=-1))
                return gan_loss_lsgan(pred, True)
            raise ValueError(term)
        return loss_fn

    for keep_name, keep in (("full", jnp.ones(4)),
                            ("drop23", jnp.asarray([1., 1., 0., 0.])),
                            ("only0", jnp.asarray([1., 0., 0., 0.]))):
        for term in ("dice_f", "dice_m", "recon", "kld", "gan"):
            loss, grads = jax.jit(jax.value_and_grad(
                make_term(term, keep)))(params_g)
            leaves = jax.tree.leaves(grads)
            finite = all(np.isfinite(np.asarray(l)).all() for l in leaves)
            gmax = max(float(np.max(np.abs(np.asarray(l)))) for l in leaves)
            print(f"keep={keep_name:7s} term={term:7s} loss={float(loss):.4f} "
                  f"grads_finite={finite} gmax={gmax:.3e}", flush=True)


if __name__ == "__main__":
    main()
