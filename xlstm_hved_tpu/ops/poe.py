"""Product-of-Experts latent fusion, reparameterization, and KL divergence.

TPU-native reformulation of the reference's S-MVAE latent stage:
- ProductOfExperts / ProductOfExperts2 (/root/reference/buildingblocks.py:846-886)
  become a single mask-based `product_of_experts` — the subset is a boolean
  keep-mask over the 4 modality experts (prior always kept), so the op is
  shape-static under jit and vmappable over the 15 subsets.
- ZeroLayerF's zero-forward/zero-grad drop semantics
  (/root/reference/buildingblocks.py:308-340) fall out for free: multiplying
  by a constant 0/1 mask zeroes both the forward value and the gradient.
- reparametrize / clip (/root/reference/RA_HVED.py:741-753).
- KL_divergence / compute_KLD (/root/reference/loss.py:29-133).

Expert stacking convention: axis 1 of `mu`/`logvar` indexes experts with the
standard-normal prior at index 0 and modalities 1..4, i.e. shape
(B, 5, D, H, W, C) channels-last (reference uses (B, 5, C, D, H, W)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LOGVAR_CLIP = 50.0
POE_EPS = 1e-8


def clip_logvar(logvar: jnp.ndarray, limit: float = LOGVAR_CLIP) -> jnp.ndarray:
    """Clamp logvars to ±50 so exp(logvar) stays finite
    (/root/reference/RA_HVED.py:749-753)."""
    return jnp.clip(logvar, -limit, limit)


def stack_prior(mod_mu: jnp.ndarray, mod_logvar: jnp.ndarray):
    """Prepend the N(0, 1) prior expert to per-modality Gaussians.

    Args:
        mod_mu, mod_logvar: (B, M, *spatial, C) per-modality parameters.
    Returns:
        (B, M+1, *spatial, C) with the prior (mu=0, logvar=0) at expert 0 and
        modality logvars clipped, matching /root/reference/RA_HVED.py:576-583.
    """
    prior_mu = jnp.zeros_like(mod_mu[:, :1])
    prior_logvar = jnp.zeros_like(mod_logvar[:, :1])
    mu = jnp.concatenate([prior_mu, mod_mu], axis=1)
    logvar = jnp.concatenate([prior_logvar, clip_logvar(mod_logvar)], axis=1)
    return mu, logvar


def product_of_experts(
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    keep: jnp.ndarray,
    eps: float = POE_EPS,
):
    """Precision-weighted Gaussian product over the kept experts + prior.

    Args:
        mu, logvar: (B, E, *spatial, C) expert parameters, prior at expert 0.
        keep: (B, 4) or (4,) boolean — True where the modality expert is kept.
            The prior is always kept. A dropped expert contributes nothing to
            either sum, and (because the mask is a constant multiplier) also
            receives zero gradient, reproducing ZeroLayerF semantics.
    Returns:
        (pd_mu, pd_logvar): (B, *spatial, C) fused posterior parameters,
        identical math to /root/reference/buildingblocks.py:853-886.
    """
    if keep.ndim == 1:
        keep = keep[None, :]
    batch = mu.shape[0]
    if keep.shape[0] == 1 and batch != 1:
        keep = jnp.broadcast_to(keep, (batch, keep.shape[1]))
    # (B, E) with prior slot always True.
    keep_e = jnp.concatenate(
        [jnp.ones((keep.shape[0], 1), dtype=bool), keep.astype(bool)], axis=1
    )
    extra = (1,) * (mu.ndim - 2)
    keep_e = keep_e.reshape(keep_e.shape + extra).astype(mu.dtype)

    var = jnp.exp(logvar) + eps
    precision = keep_e / var
    sum_t = jnp.sum(precision, axis=1)
    pd_mu = jnp.sum(mu * precision, axis=1) / sum_t
    pd_logvar = -jnp.log(sum_t)
    return pd_mu, pd_logvar


def reparametrize(
    key: jax.Array | None,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Reparameterized sample; returns the mean when `deterministic`
    (the reference's valid=True path, /root/reference/RA_HVED.py:741-747)."""
    if deterministic:
        return mu
    assert key is not None, "reparametrize needs a PRNG key when sampling"
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + eps * std


def kl_divergence(
    mu1: jnp.ndarray,
    logvar1: jnp.ndarray,
    mu2: jnp.ndarray | None = None,
    logvar2: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Mean (over all elements) KL(N(mu1, var1) || N(mu2, var2)); standard
    normal target when mu2 is None (/root/reference/loss.py:29-40)."""
    if mu2 is None:
        kld = 0.5 * jnp.mean(-1.0 - logvar1 + jnp.exp(logvar1) + jnp.square(mu1))
        return kld
    var1 = jnp.exp(logvar1)
    var2 = jnp.exp(logvar2)
    kld = 0.5 * jnp.mean(
        -1.0 + logvar2 - logvar1 + (var1 + jnp.square(mu1 - mu2)) / (var2 + eps)
    )
    return kld


def compute_kld_subsets(
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    subset_keeps: jnp.ndarray,
) -> jnp.ndarray:
    """Mean over subsets of KL(PoE(subset) || N(0,1)) for one level.

    Args:
        mu, logvar: (B, 5, *spatial, C) expert stacks (prior at 0).
        subset_keeps: (S, 4) boolean keep-masks for the sampled subsets.
    Matches /root/reference/loss.py:85-115 (the prior expert there is an
    explicit list element; here it is baked into product_of_experts).
    """

    def one(keep):
        sub_mu, sub_logvar = product_of_experts(mu, logvar, keep)
        return kl_divergence(sub_mu, sub_logvar)

    klds = jax.vmap(one)(subset_keeps)
    return jnp.mean(klds)


def compute_kld_drop(
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    drop: jnp.ndarray,
) -> jnp.ndarray:
    """Instance-missing KL: PoE over the per-instance kept modalities vs the
    prior (/root/reference/loss.py:117-133). `drop` is (B, 4), True=missing."""
    sub_mu, sub_logvar = product_of_experts(mu, logvar, ~drop.astype(bool))
    return kl_divergence(sub_mu, sub_logvar)
