"""Stage-granular rematerialization (cfg.remat): same params, same outputs,
trainable — the memory knob for training the reference crop on one chip."""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def test_remat_preserves_params_and_forward():
    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16, 4),
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}
    keep = jnp.asarray(SUBSET_MASKS[10])

    outs = {}
    trees = {}
    for remat in (False, True):
        model = find_model_using_name("XLSTM_HVED", remat=remat)
        v = jax.jit(functools.partial(model.init, deterministic=True))(rngs, x)
        trees[remat] = jax.tree_util.tree_structure(v["params"])
        outs[remat] = jax.jit(functools.partial(
            model.apply, recon=True, deterministic=True))(v, x, keep=keep)

    # nn.remat must not change the parameter tree (checkpoints interchangeable)
    assert trees[False] == trees[True]
    np.testing.assert_allclose(np.asarray(outs[False].seg),
                               np.asarray(outs[True].seg), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[False].recon),
                               np.asarray(outs[True].recon), atol=1e-6)


def test_remat_train_step_runs():
    from xlstm_hved_tpu.config import TrainConfig
    from xlstm_hved_tpu.engine.train import create_train_state, make_train_step
    from xlstm_hved_tpu.models import Discriminator, find_model_using_name

    model = find_model_using_name("XLSTM_HVED", remat=True)
    cfg = TrainConfig(crop_size=(16, 16, 16), num_epochs=5)
    disc = Discriminator(f_maps=8, kernel=3)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 16, 4),
                    jnp.float32)
    mask = (jnp.asarray(np.random.RandomState(3).rand(1, 16, 16, 16, 3)) > 0.7
            ).astype(jnp.float32)
    state, _ = create_train_state(model, disc, cfg, jax.random.PRNGKey(0), x,
                                  steps_per_epoch=2)
    step = make_train_step(model, disc, cfg, steps_per_epoch=2)
    new_state, metrics = step(state, x, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
