"""Unit tests: subsets table, PoE closed form, reparametrize, KLD, drop
gradient semantics (SURVEY.md §4 unit-test plan)."""
import jax
import jax.numpy as jnp
import numpy as np

from xlstm_hved_tpu.ops.poe import (
    clip_logvar,
    compute_kld_subsets,
    kl_divergence,
    product_of_experts,
    reparametrize,
    stack_prior,
)
from xlstm_hved_tpu.utils import subsets as S


def test_subset_table():
    assert S.NUM_SUBSETS == 15
    assert S.SUBSETS_MODALITIES[0] == (0,)
    assert S.SUBSETS_MODALITIES[13] == (1, 2, 3)
    assert S.SUBSETS_MODALITIES[14] == (0, 1, 2, 3)
    assert S.SUBSET_MASKS.sum() == sum(len(s) for s in S.SUBSETS_MODALITIES)
    # size buckets (reference off-by-one fixed): sizes of each bucket
    for size, (lo, hi) in S.SIZE_BUCKETS.items():
        for i in range(lo, hi):
            assert len(S.SUBSETS_MODALITIES[i]) == size


def test_sample_subset_index_covers_bucket(rng):
    idxs = jax.vmap(lambda k: S.sample_subset_index(k, 3, 3))(
        jax.random.split(rng, 200))
    idxs = np.asarray(idxs)
    assert set(np.unique(idxs)) == {10, 11, 12, 13}  # subset 13 now reachable


def test_sample_instance_drop_keeps_one(rng):
    drop = S.sample_instance_drop(rng, 64)
    assert drop.shape == (64, 4)
    assert not np.any(np.all(np.asarray(drop), axis=1))


def test_poe_two_expert_analytic():
    # PoE of prior N(0,1) with a single expert N(m, v):
    # posterior precision = 1 + 1/v, mean = (m/v) / (1 + 1/v)
    m, v = 1.5, 0.5
    mu = jnp.zeros((1, 5, 2, 2, 2, 1))
    logvar = jnp.zeros((1, 5, 2, 2, 2, 1))
    mu = mu.at[:, 1].set(m)
    logvar = logvar.at[:, 1].set(np.log(v))
    keep = jnp.asarray([True, False, False, False])
    pd_mu, pd_logvar = product_of_experts(mu, logvar, keep)
    t = 1.0 / (v + 1e-8) + 1.0 / (1.0 + 1e-8)
    np.testing.assert_allclose(np.asarray(pd_mu).ravel()[0], (m / (v + 1e-8)) / t,
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(pd_logvar).ravel()[0], np.log(1.0 / t),
                               rtol=3e-4)


def test_poe_dropped_expert_gets_zero_grad():
    mu = jnp.ones((1, 5, 1, 1, 1, 1))
    logvar = jnp.zeros((1, 5, 1, 1, 1, 1))
    keep = jnp.asarray([True, False, True, True])

    def f(mu):
        pd_mu, _ = product_of_experts(mu, logvar, keep)
        return jnp.sum(pd_mu)

    g = np.asarray(jax.grad(f)(mu)).ravel()
    # expert 2 (modality index 1) dropped -> zero gradient
    assert g[2] == 0.0
    assert g[1] != 0.0 and g[3] != 0.0


def test_reparametrize_deterministic_returns_mean(rng):
    mu = jnp.arange(8.0).reshape(2, 4)
    logvar = jnp.zeros_like(mu)
    np.testing.assert_array_equal(
        np.asarray(reparametrize(None, mu, logvar, deterministic=True)),
        np.asarray(mu))
    sample = reparametrize(rng, mu, logvar)
    assert not np.allclose(np.asarray(sample), np.asarray(mu))


def test_kld_standard_normal_is_zero():
    mu = jnp.zeros((4, 4))
    logvar = jnp.zeros((4, 4))
    assert float(kl_divergence(mu, logvar)) == 0.0
    # KL(N(1,1)||N(0,1)) elementwise = 0.5
    np.testing.assert_allclose(float(kl_divergence(jnp.ones((4,)), jnp.zeros((4,)))),
                               0.5, rtol=1e-6)


def test_compute_kld_subsets_full_prior():
    # experts identical to the prior -> PoE posterior variance shrinks, so
    # the KLD is positive, and the full-subset PoE of N(0,1) experts has
    # precision 5 => analytic KL per element: 0.5*(-1 - log(1/5) + 1/5)
    mod_mu = jnp.zeros((1, 4, 2, 2, 2, 3))
    mod_logvar = jnp.zeros_like(mod_mu)
    mu, logvar = stack_prior(mod_mu, mod_logvar)
    keeps = jnp.asarray(S.SUBSET_MASKS[14:15])
    kld = float(compute_kld_subsets(mu, logvar, keeps))
    # NOTE eps=1e-8 in PoE slightly perturbs; analytic approx:
    expected = 0.5 * (-1 + np.log(5.0) + 1.0 / 5.0)
    np.testing.assert_allclose(kld, expected, rtol=1e-4)


def test_clip_logvar():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    np.testing.assert_array_equal(np.asarray(clip_logvar(x)),
                                  [-50.0, 0.0, 50.0])


def test_losses_and_metrics_basics():
    from xlstm_hved_tpu.losses import dice_loss, gan_loss_lsgan
    from xlstm_hved_tpu.metrics import dice_coefficient, dice_region, psnr

    t = jnp.zeros((1, 4, 4, 4, 3)).at[:, 1:3, 1:3, 1:3, :].set(1.0)
    assert float(dice_loss(t, t)) < 1e-5
    assert float(dice_coefficient(t, t)) > 0.999
    assert float(dice_region(t, t, "TC")) > 0.999
    assert float(gan_loss_lsgan(jnp.ones((2, 2)), True)) == 0.0
    assert float(gan_loss_lsgan(jnp.zeros((2, 2)), True)) == 1.0
    assert float(psnr(t, t)) > 100.0


def test_hd95_identity_and_sentinel():
    from xlstm_hved_tpu.metrics import HD95_SENTINEL, hd95

    m = np.zeros((8, 8, 8), bool)
    m[2:5, 2:5, 2:5] = True
    assert hd95(m, m) == 0.0 or hd95(m, m) < 1e-9
    shifted = np.roll(m, 2, axis=0)
    assert 0 < hd95(m, shifted) <= 4.0
    assert hd95(np.zeros((4, 4, 4), bool), m) == 0.0
    assert HD95_SENTINEL == 373.13


def test_conv3d_slab_matches_direct(rng):
    """The 2D-slab conv must equal a direct torch-padded 3D conv (stride 1
    and 2, odd kernels)."""
    import jax
    from xlstm_hved_tpu.ops.conv3d import conv3d_slab

    x = jax.random.normal(rng, (2, 12, 10, 14, 5))
    for k, stride in ((3, 1), (3, 2), (7, 1), (1, 1)):
        w = jax.random.normal(jax.random.fold_in(rng, k), (k, k, k, 5, 6)) * 0.2
        pad = (k - 1) // 2
        ref = jax.lax.conv_general_dilated(
            x, w, (stride,) * 3, [(pad, pad)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = conv3d_slab(x, w, stride=stride)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_conv3d_slab_gradients(rng):
    import jax
    from xlstm_hved_tpu.ops.conv3d import conv3d_slab

    x = jax.random.normal(rng, (1, 6, 6, 6, 3))
    w = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, 3, 4)) * 0.2
    pad = 1

    def loss_slab(args):
        return jnp.sum(jnp.sin(conv3d_slab(*args)))

    def loss_ref(args):
        x, w = args
        return jnp.sum(jnp.sin(jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(pad, pad)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))))

    g1 = jax.grad(loss_slab)((x, w))
    g2 = jax.grad(loss_ref)((x, w))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def test_warmup_schedules():
    from xlstm_hved_tpu.utils.schedules import exponential_warmup, linear_warmup

    base = lambda c: 1.0
    lin = linear_warmup(base, 10)
    assert abs(float(lin(0)) - 0.1) < 1e-6
    assert float(lin(9)) == 1.0 and float(lin(100)) == 1.0
    exp = exponential_warmup(base, 10)
    assert 0 < float(exp(0)) < float(exp(5)) < 1.0
