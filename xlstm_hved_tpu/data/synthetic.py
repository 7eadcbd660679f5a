"""Synthetic BraTS-like volumes for tests and benches: smooth multi-modal
intensities with a nested ellipsoidal 'tumor' labeled 1 (ET) / 2 (edema) /
3 (necrosis-ish) matching the label alphabet SegToMask expects."""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np


def synthetic_subject(rng: np.random.RandomState,
                      shape: Sequence[int] = (64, 64, 64)
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (img (4, D, H, W) in [0, 255], labels (D, H, W) in {0,1,2,3})."""
    D, H, W = shape
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, D), np.linspace(-1, 1, H),
                             np.linspace(-1, 1, W), indexing="ij")
    center = rng.uniform(-0.3, 0.3, 3)
    radii = rng.uniform(0.25, 0.5, 3)
    r = (((zz - center[0]) / radii[0]) ** 2 + ((yy - center[1]) / radii[1]) ** 2
         + ((xx - center[2]) / radii[2]) ** 2)
    brain = r < 4.0
    labels = np.zeros(shape, np.int16)
    labels[r < 1.0] = 2   # edema
    labels[r < 0.5] = 3   # inner region
    labels[r < 0.2] = 1   # enhancing tumor
    img = np.zeros((4,) + tuple(shape), np.float32)
    for c in range(4):
        base = 80 + 30 * c + 20 * np.sin(3 * (zz + c)) * np.cos(2 * yy)
        noise = rng.randn(*shape) * 5
        tumor_boost = (labels > 0) * rng.uniform(20, 60)
        img[c] = np.clip((base + noise + tumor_boost) * brain, 0, 255)
    return img, labels


def write_synthetic_dataset(root: str, n_subjects: int = 2,
                            shape: Sequence[int] = (32, 32, 32),
                            seed: int = 0) -> str:
    """Materialize a BraTS-layout directory of synthetic subjects (for
    end-to-end loader/eval tests)."""
    from xlstm_hved_tpu.data.nifti import write_nifti

    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n_subjects):
        name = f"SYN-{i:04d}"
        sdir = os.path.join(root, name)
        os.makedirs(sdir, exist_ok=True)
        img, labels = synthetic_subject(rng, shape)
        for c, suffix in enumerate(("t1c", "t1n", "t2f", "t2w")):
            write_nifti(os.path.join(sdir, f"{name}-{suffix}.nii.gz"), img[c])
        write_nifti(os.path.join(sdir, f"{name}-seg.nii.gz"),
                    labels.astype(np.uint8))
    return root
