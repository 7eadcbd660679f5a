"""Forward-contract tests for the HVED engine (SURVEY.md §3.4):
shapes, subset semantics, deterministic eval, seg/recon flag combinations.

Everything runs under jit (eager flax dispatch of this many small convs is
slow on CPU); jitted callables are shared per-module to bound compile count.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_hved_tpu.models import Discriminator, find_model_using_name
from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

SHAPE = (1, 16, 16, 16, 4)  # tiny volume for CPU tests


@pytest.fixture(scope="module")
def flagship():
    model = find_model_using_name("XLSTM_HVED")
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE), jnp.float32)
    variables = jax.jit(functools.partial(model.init, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x)

    @jax.jit
    def f_sample(v, x, key):
        return model.apply(v, x, recon=True, rngs={"latent": key})

    @jax.jit
    def f_eval(v, x, keep):
        return model.apply(v, x, keep=keep, deterministic=True)

    return model, variables, x, f_sample, f_eval


FULL = jnp.asarray(SUBSET_MASKS[14])


def test_flagship_shapes(flagship):
    _, variables, x, f_sample, _ = flagship
    out = f_sample(variables, x, jax.random.PRNGKey(2))
    assert out.seg.shape == (1, 16, 16, 16, 3)
    assert out.recon.shape == (1, 16, 16, 16, 4)
    assert len(out.mu) == 4 and len(out.logvar) == 4
    # per-level expert stacks: (B, 5, D/2^{l+1}, ..., latents[l])
    for lvl, (m, lv) in enumerate(zip(out.mu, out.logvar)):
        assert m.shape[1] == 5
        assert m.shape == lv.shape
        assert m.shape[-1] == [1, 2, 4, 8][lvl]
        assert m.shape[2] == 16 // (2 ** (lvl + 1))
    seg = np.asarray(out.seg)
    assert np.all((seg >= 0) & (seg <= 1))
    assert np.all(np.isfinite(np.asarray(out.recon)))


def test_deterministic_eval_reproducible(flagship):
    _, variables, x, _, f_eval = flagship
    o1 = f_eval(variables, x, FULL)
    o2 = f_eval(variables, x, FULL)
    np.testing.assert_array_equal(np.asarray(o1.seg), np.asarray(o2.seg))


def test_sampling_uses_rng(flagship):
    _, variables, x, f_sample, _ = flagship
    o1 = f_sample(variables, x, jax.random.PRNGKey(2))
    o2 = f_sample(variables, x, jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(o1.seg), np.asarray(o2.seg))


def test_subset_keep_changes_output(flagship):
    _, variables, x, _, f_eval = flagship
    full = f_eval(variables, x, FULL)
    single = f_eval(variables, x, jnp.asarray(SUBSET_MASKS[0]))
    assert not np.allclose(np.asarray(full.seg), np.asarray(single.seg))


def test_instance_missing_matches_explicit_keep(flagship):
    model, variables, x, _, f_eval = flagship
    x_missing = x.at[..., 1].set(0.0)

    @jax.jit
    def f_inst(v, xm):
        return model.apply(v, xm, instance_missing=True, deterministic=True)

    out = f_inst(variables, x_missing)
    out2 = f_eval(variables, x_missing,
                  jnp.asarray([True, False, True, True]))
    np.testing.assert_allclose(np.asarray(out.seg), np.asarray(out2.seg),
                               atol=1e-6)


def test_seg_false_skips_seg(flagship):
    model, variables, x, _, _ = flagship

    @jax.jit
    def f(v, x, key):
        return model.apply(v, x, seg=False, recon=True, rngs={"latent": key})

    out = f(variables, x, jax.random.PRNGKey(2))
    assert out.seg is None
    assert out.recon is not None


@pytest.mark.parametrize("name", ["U_HVEDConvNet3D", "XLSTM_HVED_woDuSFE",
                                  "FusionUNet3D", "U_HVEDNet3D"])
def test_zoo_variants_forward(name):
    model = find_model_using_name(name)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE), jnp.float32)
    variables = jax.jit(functools.partial(model.init, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x)
    out = jax.jit(functools.partial(model.apply, recon=True))(
        variables, x, rngs={"latent": jax.random.PRNGKey(2)})
    assert out.seg.shape == (1, 16, 16, 16, 3)
    assert out.recon.shape == (1, 16, 16, 16, 4)


def test_discriminator_shapes():
    disc = Discriminator(f_maps=8, kernel=4, strides=(1, 2, 2, 2))
    x = jnp.zeros((1, 32, 32, 32, 7))
    params = disc.init(jax.random.PRNGKey(0), x)
    out = jax.jit(disc.apply)(params, x)
    assert out.shape[0] == 1 and out.shape[-1] == 1
    # too-small input -> clear error instead of empty-tensor NaNs
    import pytest as _pytest
    with _pytest.raises(ValueError, match="too small"):
        disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 7)))
