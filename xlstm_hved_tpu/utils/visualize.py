"""Segmentation visualization (reference plot_segm, /root/reference/utils.py:531-557):
dump mid-volume slices of image + predicted/GT masks as PNGs (PIL; no
matplotlib dependency needed)."""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# WT / TC / ET overlay colors (RGB)
_COLORS = np.asarray([[66, 135, 245], [245, 197, 66], [245, 66, 66]],
                     np.float32)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    lo, hi = float(img.min()), float(img.max())
    if hi <= lo:
        return np.zeros_like(img, np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def segmentation_overlay(image: np.ndarray, mask: np.ndarray,
                         alpha: float = 0.45) -> np.ndarray:
    """image (H, W), mask (H, W, 3) nested WT/TC/ET -> RGB uint8 overlay."""
    base = _to_uint8(image)
    rgb = np.stack([base] * 3, axis=-1).astype(np.float32)
    for c in range(3):
        sel = mask[..., c] > 0.5
        rgb[sel] = (1 - alpha) * rgb[sel] + alpha * _COLORS[c]
    return rgb.astype(np.uint8)


def plot_segm(out_dir: str, name: str, image: np.ndarray, pred: np.ndarray,
              target: Optional[np.ndarray] = None,
              slices: Optional[Sequence[int]] = None) -> list:
    """Dump axial slice overlays. image (D, H, W) or (D, H, W, C) (channel 0
    used); pred/target (D, H, W, 3). Returns written paths."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    if image.ndim == 4:
        image = image[..., 0]
    D = image.shape[0]
    if slices is None:
        slices = [D // 4, D // 2, 3 * D // 4]
    paths = []
    for s in slices:
        panels = [segmentation_overlay(image[s], pred[s])]
        if target is not None:
            panels.append(segmentation_overlay(image[s], target[s]))
        panel = np.concatenate(panels, axis=1)
        path = os.path.join(out_dir, f"{name}_z{s}.png")
        Image.fromarray(panel).save(path)
        paths.append(path)
    return paths
