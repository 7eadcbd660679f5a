"""Evaluation metrics (re-design of /root/reference/metrics.py and the
PSNR/SSIM from /root/reference/Pretrain.py:68-77).

Dice/IoU/PSNR/SSIM are jittable (channels-last). HD95 runs on host (scipy
KDTree) outside jit, with the reference's 373.13 sentinel for empty/infinite
surface sets (metrics.py:258-262) and surface extraction via a 3D Sobel edge
detector (metrics.py:264-290).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HD95_SENTINEL = 373.13  # ~ BraTS volume diagonal (metrics.py:259-262)

REGION_CHANNEL = {"WT": 0, "TC": 1, "EC": 2, "ET": 2}


def dice_coefficient(pred: jnp.ndarray, target: jnp.ndarray,
                     epsilon: float = 1e-6) -> jnp.ndarray:
    """Hard (>0.5) per-channel dice, averaged over channels
    (reference DiceCoefficient, metrics.py:10-48)."""
    p = (pred > 0.5).astype(jnp.float32)
    t = target.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim - 1))
    intersect = jnp.sum(p * t, axis=axes)
    denom = jnp.sum(p + t, axis=axes)
    res = (2 * intersect + epsilon) / (denom + epsilon)
    return jnp.mean(res)


def dice_region(pred: jnp.ndarray, target: jnp.ndarray, region: str = "WT",
                mode: str = "sigmoid", epsilon: float = 1e-6) -> jnp.ndarray:
    """WT/TC/EC dice on the nested sigmoid channels
    (reference DiceRegion, metrics.py:51-107)."""
    if mode == "sigmoid":
        ch = REGION_CHANNEL[region]
        input_roi = (pred[..., ch] > 0.5).astype(jnp.float32)
        target_roi = target[..., ch].astype(jnp.float32)
    else:  # softmax label volumes
        pl = jnp.argmax(pred, axis=-1)
        tl = jnp.argmax(target, axis=-1)
        if region == "WT":
            input_roi = (pl > 0).astype(jnp.float32)
            target_roi = (tl > 0).astype(jnp.float32)
        elif region == "TC":
            input_roi = ((pl > 0) & (pl != 2)).astype(jnp.float32)
            target_roi = ((tl > 0) & (tl != 2)).astype(jnp.float32)
        else:
            input_roi = (pl == 3).astype(jnp.float32)
            target_roi = (tl == 3).astype(jnp.float32)
    axes = tuple(range(1, input_roi.ndim))
    intersect = jnp.sum(input_roi * target_roi, axis=axes)
    denom = jnp.sum(input_roi + target_roi, axis=axes)
    return jnp.mean((2 * intersect + epsilon) / (denom + epsilon))


def mean_iou(pred: jnp.ndarray, target: jnp.ndarray,
             epsilon: float = 1e-8) -> jnp.ndarray:
    """Per-class IoU averaged over classes and batch (reference MeanIoU,
    metrics.py:110-182). Multi-channel predictions are argmax-binarized."""
    n_classes = pred.shape[-1]
    if n_classes == 1:
        binary = (pred > 0.5).astype(jnp.float32)
    else:
        binary = jax.nn.one_hot(jnp.argmax(pred, axis=-1), n_classes)
    t = target.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim - 1))
    inter = jnp.sum(binary * t, axis=axes)
    union = jnp.clip(jnp.sum(jnp.maximum(binary, t), axis=axes), min=epsilon)
    return jnp.mean(inter / union)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """10*log10(1/MSE) on [0,1] data (reference Pretrain.py:68-71)."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32) -
                              target.astype(jnp.float32)))
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def ssim3d(pred: jnp.ndarray, target: jnp.ndarray, window: int = 7,
           data_range: float = 1.0, k1: float = 0.01,
           k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM with a uniform 3D window (torchmetrics-equivalent structure,
    reference Pretrain.py:72-77). pred/target: (B, D, H, W, C)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)

    def unif(x):
        # mean filter over spatial dims via separable cumsum-free reduce_window
        w = (1, window, window, window, 1)
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, w, (1, 1, 1, 1, 1), "VALID"
        ) / float(window ** 3)

    mu_p, mu_t = unif(p), unif(t)
    sig_p = unif(p * p) - mu_p ** 2
    sig_t = unif(t * t) - mu_t ** 2
    sig_pt = unif(p * t) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * sig_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (sig_p + sig_t + c2)
    return jnp.mean(num / den)


# ---------------- host-side HD95 (outside jit) ----------------

# The reference's three edge kernels verbatim (metrics.py:277-289): X is a
# true 3D Sobel, but Y smooths z with [1,1,1] and Z is the all-ones Prewitt
# style — NOT transposes of X. The exact kernels matter: they decide which
# voxels count as surface, hence the HD95 value (parity-tested in
# test_metrics_parity.py).
_SOBEL_X = np.array(
    [[[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
     [[-2, 0, 2], [-4, 0, 4], [-2, 0, 2]],
     [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]], dtype=np.float32)
_SOBEL_Y = np.array(
    [[[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
     [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
     [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]], dtype=np.float32)
_SOBEL_Z = np.array(
    [[[-1, -1, -1], [-1, -1, -1], [-1, -1, -1]],
     [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
     [[1, 1, 1], [1, 1, 1], [1, 1, 1]]], dtype=np.float32)


def _surface_points(mask: np.ndarray, spacing=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Sobel-edge surface voxel coordinates (reference get_surface_points,
    metrics.py:264-290)."""
    from scipy.ndimage import convolve

    mask = mask.astype(np.float32)
    edges = np.zeros_like(mask, dtype=bool)
    for kern in (_SOBEL_X, _SOBEL_Y, _SOBEL_Z):
        edges |= np.abs(convolve(mask, kern, mode="constant")) > 0
    idx = np.argwhere(edges).astype(np.float64)
    return idx * np.asarray(spacing)


def hd95(pred_mask: np.ndarray, target_mask: np.ndarray,
         spacing=(1.0, 1.0, 1.0)) -> float:
    """95th-percentile symmetric Hausdorff distance between surface point
    sets via KDTree (reference getHausdorff_KD, metrics.py:190-308), with the
    reference's sentinels: 0 for empty surface sets, 373.13 for inf."""
    from scipy.spatial import KDTree

    s1 = _surface_points(np.asarray(pred_mask) > 0.5, spacing)
    s2 = _surface_points(np.asarray(target_mask) > 0.5, spacing)
    if s1.size == 0 or s2.size == 0:
        return 0.0
    tree1, tree2 = KDTree(s1), KDTree(s2)
    d_1to2, _ = tree1.query(s2, k=1)
    d_2to1, _ = tree2.query(s1, k=1)
    out = max(np.percentile(d_1to2, 95), np.percentile(d_2to1, 95))
    if not np.isfinite(out):
        return HD95_SENTINEL
    return float(out)


def hd95_region(pred: np.ndarray, target: np.ndarray, region: str = "WT",
                spacing=(1.0, 1.0, 1.0)) -> float:
    """HD95 on one nested region channel of (B, D, H, W, 3) volumes."""
    ch = REGION_CHANNEL[region]
    total = []
    for b in range(pred.shape[0]):
        total.append(hd95(pred[b, ..., ch] > 0.5, target[b, ..., ch] > 0.5,
                          spacing))
    return float(np.mean(total))
