"""Loss-function parity against the ACTUAL reference loss.py (torch CPU).

Complements the fp64 oracles in test_oracles.py: these tests import
/root/reference/loss.py itself and assert our jitted losses agree on the
same random inputs (layout-translated NCDHW <-> NDHWC).
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_loader import load_reference  # noqa: E402

from xlstm_hved_tpu.losses import (  # noqa: E402
    bce_loss,
    boundary_loss,
    dice_loss,
    gan_loss_lsgan,
    generalized_dice_loss,
    weighted_cross_entropy_loss,
)
from xlstm_hved_tpu.ops.poe import (  # noqa: E402
    compute_kld_drop,
    compute_kld_subsets,
)
from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS  # noqa: E402


def _ref_loss():
    load_reference()  # sys.path + cuda neutralization
    import loss as ref_loss  # noqa: E402

    return ref_loss


def _pair(rng, shape=(2, 3, 6, 7, 5), probs=True):
    """(torch NCDHW tensor, jax NDHWC array) of the same values."""
    import torch

    a = rng.rand(*shape).astype(np.float32)
    if not probs:
        a = (a - 0.5) * 4.0
    return torch.from_numpy(a), jnp.asarray(np.moveaxis(a, 1, -1))


def test_dice_and_gdl_parity():
    ref = _ref_loss()
    rng = np.random.RandomState(0)
    tp, jp = _pair(rng)
    tt_np = (rng.rand(2, 3, 6, 7, 5) > 0.5).astype(np.float32)
    import torch

    tt, jt = torch.from_numpy(tt_np), jnp.asarray(np.moveaxis(tt_np, 1, -1))
    np.testing.assert_allclose(float(ref.DiceLoss()(tp, tt)),
                               float(dice_loss(jp, jt)), atol=1e-6)
    np.testing.assert_allclose(float(ref.GeneralizedDiceLoss()(tp, tt)),
                               float(generalized_dice_loss(jp, jt)),
                               atol=1e-6)


def test_bce_and_gan_parity():
    ref = _ref_loss()
    rng = np.random.RandomState(1)
    tp, jp = _pair(rng)
    tt_np = (rng.rand(2, 3, 6, 7, 5) > 0.5).astype(np.float32)
    import torch

    tt, jt = torch.from_numpy(tt_np), jnp.asarray(np.moveaxis(tt_np, 1, -1))
    np.testing.assert_allclose(float(ref.BCELoss()(tp, tt)),
                               float(bce_loss(jp, jt)), atol=1e-5)
    gan = ref.GANLoss(use_lsgan=True)
    d = torch.from_numpy(rng.rand(2, 1, 4, 4, 4).astype(np.float32))
    for real in (True, False):
        np.testing.assert_allclose(
            float(gan(d, real)),
            float(gan_loss_lsgan(jnp.asarray(d.numpy()), real)), atol=1e-6)


def test_boundary_loss_parity():
    ref = _ref_loss()
    rng = np.random.RandomState(2)
    tp, jp = _pair(rng)
    sdf_np = (rng.rand(2, 3, 6, 7, 5).astype(np.float32) - 0.5) * 2
    import torch

    np.testing.assert_allclose(
        float(ref.boundary_loss(tp, torch.from_numpy(sdf_np))),
        float(boundary_loss(jp, jnp.asarray(np.moveaxis(sdf_np, 1, -1)))),
        atol=1e-6)


def test_wce_parity():
    """torch F.cross_entropy(weight=w) divides by the SUM OF WEIGHTS of the
    selected labels, not the element count — the parity target here."""
    ref = _ref_loss()
    rng = np.random.RandomState(3)
    tl, jl = _pair(rng, probs=False)
    lab = rng.randint(0, 3, size=(2, 6, 7, 5))
    onehot = np.eye(3, dtype=np.float32)[lab]          # (B,D,H,W,C)
    import torch

    t_onehot = torch.from_numpy(np.moveaxis(onehot, -1, 1))
    t_val = float(ref.WeightedCrossEntropyLoss()(tl, t_onehot))
    j_val = float(weighted_cross_entropy_loss(jl, jnp.asarray(onehot)))
    np.testing.assert_allclose(t_val, j_val, rtol=1e-5)


@pytest.mark.parametrize("subset_idx", [[14], [4, 9, 13]])
def test_compute_kld_parity(subset_idx):
    """compute_KLD over sampled subsets: reference stacks experts as
    (B, 5, C, W, H, D) with the prior at index 0; ours bakes the prior into
    product_of_experts and takes (B, 5, *spatial, C) with the same ordering.
    """
    ref = _ref_loss()
    rng = np.random.RandomState(4)
    B, C, D, H, W = 2, 4, 3, 4, 5
    mu = rng.randn(B, 5, C, D, H, W).astype(np.float32)
    logvar = rng.randn(B, 5, C, D, H, W).astype(np.float32) * 0.3
    mu[:, 0] = 0.0        # prior expert N(0,1), as the model emits
    logvar[:, 0] = 0.0
    import torch

    t_val = float(ref.compute_KLD(torch.from_numpy(mu),
                                  torch.from_numpy(logvar),
                                  subset_index_list=subset_idx))
    j_mu = jnp.asarray(np.moveaxis(mu, 2, -1))          # (B,5,D,H,W,C)
    j_logvar = jnp.asarray(np.moveaxis(logvar, 2, -1))
    keeps = jnp.asarray(np.stack([SUBSET_MASKS[i] for i in subset_idx]))
    j_val = float(compute_kld_subsets(j_mu, j_logvar, keeps))
    np.testing.assert_allclose(t_val, j_val, rtol=2e-5, atol=1e-6)


def test_compute_kld_drop_parity_nothing_dropped():
    """DOCUMENTED DEVIATION (intended-math policy): the reference's
    compute_KLD_drop is dead code — never called from any train path, and
    ProductOfExperts2's drop-masking lines are commented out
    (loss.py:76-78), so it silently ignores `drop` and fuses all 5 experts.
    Our compute_kld_drop implements the INTENDED semantics (PoE over the
    per-instance KEPT modalities). The two agree exactly in the one case
    where the reference's dead code is right: nothing dropped."""
    ref = _ref_loss()
    rng = np.random.RandomState(5)
    B, C, D, H, W = 2, 4, 3, 4, 5
    mu = rng.randn(5, B, C, D, H, W).astype(np.float32)
    logvar = rng.randn(5, B, C, D, H, W).astype(np.float32) * 0.3
    mu[0] = 0.0
    logvar[0] = 0.0
    drop = np.zeros((B, 4), np.float32)
    import torch

    _, t_val = ref.compute_KLD_drop(torch.from_numpy(mu),
                                    torch.from_numpy(logvar),
                                    torch.from_numpy(drop))
    j_mu = jnp.asarray(np.moveaxis(mu.transpose(1, 0, 2, 3, 4, 5), 2, -1))
    j_logvar = jnp.asarray(
        np.moveaxis(logvar.transpose(1, 0, 2, 3, 4, 5), 2, -1))
    j_val = float(compute_kld_drop(j_mu, j_logvar, jnp.asarray(drop)))
    np.testing.assert_allclose(float(t_val), j_val, rtol=2e-5, atol=1e-6)

    # and with a real drop pattern, ours EXCLUDES the dropped experts:
    # KLD must differ from the all-experts value (the reference's dead code
    # would return t_val unchanged)
    drop2 = np.array([[1, 0, 0, 1], [0, 0, 1, 0]], np.float32)
    j_masked = float(compute_kld_drop(j_mu, j_logvar, jnp.asarray(drop2)))
    assert abs(j_masked - j_val) > 1e-4
