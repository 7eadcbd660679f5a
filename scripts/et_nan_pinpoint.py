"""Pinpoint the decoder-side backward NaN with jax_debug_nans: runs the
dice_f-only gradient at the torch surgery-point state and lets JAX raise at
the first NaN-producing primitive, printing its provenance. CPU-only."""
from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from torch_control_et import N_TRAIN, make_data  # noqa: E402
from et_engine_ab import torch_surgery_state  # noqa: E402


def main():
    xt, mt = make_data(N_TRAIN, seed=0)
    ft_sd, _disc_sd = torch_surgery_state(xt, pre_epochs=8)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from xlstm_hved_tpu.losses import dice_loss
    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.compcache import enable_persistent_cache
    from xlstm_hved_tpu.utils.torch_import import hved_params_from_torch

    enable_persistent_cache()
    model = find_model_using_name("XLSTM_HVED", compute_dtype="float32")
    params_g, stats_g = hved_params_from_torch(ft_sd, model.cfg)
    xt_j = jnp.asarray(np.moveaxis(xt, 1, -1))
    mt_j = jnp.asarray(np.moveaxis(mt, 1, -1))
    x1, m1 = xt_j[:1], mt_j[:1]
    k1 = jax.random.PRNGKey(5)

    def loss_fn(p):
        mvars = {"params": p}
        if stats_g:
            mvars["batch_stats"] = stats_g
            out_f, _ = model.apply(mvars, x1, recon=True, train=True,
                                   rngs={"latent": k1},
                                   mutable=["batch_stats"])
        else:
            out_f = model.apply(mvars, x1, recon=True, train=True,
                                rngs={"latent": k1})
        return dice_loss(out_f.seg, m1)

    try:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params_g)
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        bad = [(jax.tree_util.keystr(pth),
                int((~np.isfinite(np.asarray(l))).sum()))
               for pth, l in leaves if not np.isfinite(np.asarray(l)).all()]
        print(f"loss={float(loss):.4f} nan_leaves={len(bad)}")
        for name, cnt in bad[:40]:
            print(f"  {name}: {cnt} non-finite")
    except FloatingPointError as e:
        print("debug_nans raised:")
        print(e)


if __name__ == "__main__":
    main()
