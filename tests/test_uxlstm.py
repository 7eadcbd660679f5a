"""Tests for the UxLSTM nnU-Net family (models/uxlstm.py), DropPath, the
interpolatable pos embed, and the DuRegister registration head — the
component-inventory tail of SURVEY.md §2.2/§2.3."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _init_apply(model, x, **apply_kw):
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(functools.partial(model.apply, **apply_kw))(variables, x)
    return variables, out


def test_uxlstm_enc_3d_forward_and_channel_token_schedule():
    from xlstm_hved_tpu.models.uxlstm import UXlstmEnc, channel_token_schedule

    strides = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
    feats = (4, 8, 16, 32)
    # maps 16^3, 8^3, 4^3, 2^3 -> only the last stage (8 voxels <= 32 feats)
    # goes channel-token, mirroring UxLSTMEnc_3d.py:168-179
    do_ct, sizes = channel_token_schedule((16, 16, 16), feats, strides)
    assert do_ct == [False, False, False, True]
    assert sizes[-1] == (2, 2, 2)

    model = UXlstmEnc(input_size=(16, 16, 16), input_channels=2,
                      features_per_stage=feats, num_classes=3,
                      strides=strides, n_conv_per_stage=1,
                      n_conv_per_stage_decoder=1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16, 2),
                    jnp.float32)
    _, y = _init_apply(model, x)
    assert y.shape == (1, 16, 16, 16, 3)
    assert bool(jnp.isfinite(y).all())


def test_uxlstm_bot_2d_deep_supervision():
    from xlstm_hved_tpu.models.uxlstm import UXlstmBot

    model = UXlstmBot(input_size=(16, 16), input_channels=1,
                      features_per_stage=(4, 8, 16), num_classes=2,
                      strides=(1, 2, 2), n_conv_per_stage=1,
                      n_conv_per_stage_decoder=1, deep_supervision=True)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 1), jnp.float32)
    _, ys = _init_apply(model, x)
    # highest resolution first (UxLSTMEnc_3d.py:403)
    assert len(ys) == 2
    assert ys[0].shape == (2, 16, 16, 2)
    assert ys[1].shape == (2, 8, 8, 2)


def test_build_uxlstm_from_plans_plain_dict():
    from xlstm_hved_tpu.models.uxlstm import UXlstmEnc, build_uxlstm_from_plans

    plans = {
        "patch_size": [16, 16, 16],
        "conv_kernel_sizes": [[3, 3, 3]] * 3,
        "pool_op_kernel_sizes": [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
        "n_conv_per_stage_encoder": [1, 1, 1],
        "n_conv_per_stage_decoder": [1, 1],
        "UNet_base_num_features": 4,
        "unet_max_num_features": 8,
    }
    model = build_uxlstm_from_plans(plans, num_input_channels=1,
                                    num_classes=2, deep_supervision=False)
    assert isinstance(model, UXlstmEnc)
    assert model.features_per_stage == (4, 8, 8)  # capped at max features
    x = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    _, y = _init_apply(model, x)
    assert y.shape == (1, 16, 16, 16, 2)


def test_droppath_eval_identity_and_train_masking():
    from xlstm_hved_tpu.nn.vil import DropPath

    x = jnp.ones((8, 4))
    res = jnp.full((8, 4), 2.0)
    dp = DropPath(rate=0.5)
    variables = dp.init(jax.random.PRNGKey(0), x, res)

    # no droppath rng -> deterministic x + residual (eval semantics)
    y_eval = dp.apply(variables, x, res)
    np.testing.assert_allclose(np.asarray(y_eval), 3.0)

    # with rng: each sample is either dropped (1.0) or kept-and-rescaled (5.0)
    y_train = dp.apply(variables, x, res,
                       rngs={"droppath": jax.random.PRNGKey(3)})
    vals = np.unique(np.asarray(y_train))
    assert set(vals.tolist()) <= {1.0, 5.0}
    assert len(vals) == 2  # both outcomes present at rate 0.5 over 8 samples


def test_pos_embed_interpolation_resolution_transfer():
    from xlstm_hved_tpu.models.vision_lstm import VitPosEmbedND

    mod = VitPosEmbedND(dim=8, seqlens=(4, 4))
    x_small = jnp.zeros((1, 4, 4, 8))
    variables = mod.init(jax.random.PRNGKey(0), x_small)
    embed = variables["params"]["embed"]

    # same grid: exact add
    y = mod.apply(variables, x_small)
    np.testing.assert_allclose(np.asarray(y), np.asarray(embed), rtol=1e-6)

    # different grid: bicubic-interpolated, finite, shape-matched
    x_big = jnp.zeros((1, 8, 8, 8))  # (B, 8x8 grid, dim=8)
    y_big = mod.apply(variables, x_big)
    assert y_big.shape == (1, 8, 8, 8)
    assert bool(jnp.isfinite(y_big).all())
    # mean is approximately preserved by interpolation
    np.testing.assert_allclose(float(y_big.mean()), float(embed.mean()),
                               atol=5e-3)


def test_duregister_head_emits_rigid_params():
    from xlstm_hved_tpu.nn.dusfe import DuRegisterDuSE

    model = DuRegisterDuSE(features=4)
    x1 = jnp.asarray(np.random.RandomState(3).rand(1, 8, 8, 8, 1), jnp.float32)
    x2 = jnp.asarray(np.random.RandomState(4).rand(1, 8, 8, 8, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1, x2)
    out = jax.jit(model.apply)(variables, x1, x2)
    assert out.shape == (1, 6)
    assert bool(jnp.isfinite(out).all())
