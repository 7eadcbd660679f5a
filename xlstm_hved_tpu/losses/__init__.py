"""Loss functions (functional re-design of /root/reference/loss.py).

All losses take probabilities (post-sigmoid/softmax) like the reference
(its DiceLoss normalization is commented out) and reduce to fp32 scalars.
Channels-last: tensors are (B, D, H, W, C).
"""
from __future__ import annotations

import jax.numpy as jnp

from xlstm_hved_tpu.ops.poe import (  # re-exported for engine use
    compute_kld_drop,
    compute_kld_subsets,
    kl_divergence,
)

__all__ = [
    "dice_loss",
    "generalized_dice_loss",
    "per_channel_dice",
    "gan_loss_lsgan",
    "boundary_loss",
    "weighted_cross_entropy_loss",
    "bce_loss",
    "l2_loss",
    "kl_divergence",
    "compute_kld_subsets",
    "compute_kld_drop",
]


def _flatten_per_channel(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ..., C) -> (C, B*spatial) (reference flatten, loss.py:287-300)."""
    c = x.shape[-1]
    return jnp.moveaxis(x, -1, 0).reshape(c, -1)


def per_channel_dice(pred: jnp.ndarray, target: jnp.ndarray,
                     epsilon: float = 1e-6) -> jnp.ndarray:
    """Soft dice per channel with the V-Net (x^2 + y^2) denominator
    (reference compute_per_channel_dice, loss.py:257-285)."""
    p = _flatten_per_channel(pred.astype(jnp.float32))
    t = _flatten_per_channel(target.astype(jnp.float32))
    intersect = jnp.sum(p * t, axis=-1)
    denom = jnp.sum(p * p, axis=-1) + jnp.sum(t * t, axis=-1)
    return 2.0 * intersect / jnp.clip(denom, min=epsilon)


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - mean per-channel soft dice (reference DiceLoss, loss.py:188-209)."""
    return 1.0 - jnp.mean(per_channel_dice(pred, target))


def generalized_dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
                          epsilon: float = 1e-6) -> jnp.ndarray:
    """Inverse-volume-weighted GDL (reference GeneralizedDiceLoss,
    loss.py:211-255)."""
    p = _flatten_per_channel(pred.astype(jnp.float32))
    t = _flatten_per_channel(target.astype(jnp.float32))
    if p.shape[0] == 1:
        p = jnp.concatenate([p, 1.0 - p], axis=0)
        t = jnp.concatenate([t, 1.0 - t], axis=0)
    w = jnp.sum(t, axis=-1)
    w = 1.0 / jnp.clip(w * w, min=epsilon)
    w = jnp.where(jnp.isfinite(w), w, jnp.zeros_like(w))
    intersect = jnp.sum(p * t, axis=-1) * w
    denom = jnp.clip(jnp.sum((p + t), axis=-1) * w, min=epsilon)
    return 1.0 - 2.0 * jnp.sum(intersect) / jnp.sum(denom)


def gan_loss_lsgan(pred: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """LSGAN MSE-vs-constant loss (reference GANLoss, loss.py:167-186)."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


def boundary_loss(probs: jnp.ndarray, gt_sdf: jnp.ndarray) -> jnp.ndarray:
    """<probabilities, signed distance map> (reference boundary_loss,
    loss.py:136-146)."""
    return jnp.mean(probs.astype(jnp.float32) * gt_sdf.astype(jnp.float32))


def bce_loss(pred: jnp.ndarray, target: jnp.ndarray,
             epsilon: float = 1e-7) -> jnp.ndarray:
    """Sum over channels of per-channel BCE on probabilities (reference
    BCELoss, loss.py:149-165)."""
    p = jnp.clip(pred.astype(jnp.float32), epsilon, 1.0 - epsilon)
    t = target.astype(jnp.float32)
    per_ch = -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log1p(-p),
                       axis=tuple(range(pred.ndim - 1)))
    return jnp.sum(per_ch)


def weighted_cross_entropy_loss(logits: jnp.ndarray,
                                target: jnp.ndarray) -> jnp.ndarray:
    """WCE with inverse-frequency class weights (reference
    WeightedCrossEntropyLoss, loss.py:303-324). `target` is one-hot over the
    channel axis; weights are treated as constants (stop-gradient). Matches
    torch.nn.functional.cross_entropy(weight=w) exactly, including its
    weighted-MEAN normalization: sum(w_y*nll)/sum(w_y), not mean(w_y*nll)
    (parity-tested against the reference in test_loss_parity.py)."""
    import jax

    flat = _flatten_per_channel(logits.astype(jnp.float32))
    nominator = jnp.sum(1.0 - flat, axis=-1)
    denominator = jnp.sum(flat, axis=-1)
    weights = jax.lax.stop_gradient(nominator / denominator)
    labels = jnp.argmax(target, axis=-1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) -
                               target.astype(jnp.float32)))
