"""Metric parity against the ACTUAL reference metrics.py (torch CPU):
DiceCoefficient, DiceRegion (both modes), MeanIoU, and the KDTree HD95
surface machinery. Layouts translated NCDHW <-> NDHWC."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_loader import load_reference  # noqa: E402

from xlstm_hved_tpu.metrics import (  # noqa: E402
    dice_coefficient,
    dice_region,
    hd95,
    mean_iou,
)


def _ref_metrics():
    load_reference()
    import metrics as ref_metrics  # noqa: E402

    return ref_metrics


def _blob(rng, shape=(2, 3, 10, 12, 11)):
    """Random soft predictions with coherent blobs (so >0.5 masks have
    structure and surfaces exist)."""
    from scipy.ndimage import gaussian_filter

    x = rng.rand(*shape).astype(np.float32)
    for b in range(shape[0]):
        for c in range(shape[1]):
            x[b, c] = gaussian_filter(x[b, c], sigma=2.0)
    x -= x.min()
    x /= x.max()
    return x


def test_dice_coefficient_parity():
    ref = _ref_metrics()
    rng = np.random.RandomState(0)
    p = _blob(rng)
    t = (rng.rand(2, 3, 10, 12, 11) > 0.6).astype(np.float32)
    import torch

    t_val = float(ref.DiceCoefficient()(torch.from_numpy(p),
                                        torch.from_numpy(t)))
    j_val = float(dice_coefficient(jnp.asarray(np.moveaxis(p, 1, -1)),
                                   jnp.asarray(np.moveaxis(t, 1, -1))))
    np.testing.assert_allclose(t_val, j_val, rtol=1e-5)


@pytest.mark.parametrize("region", ["WT", "TC", "EC"])
@pytest.mark.parametrize("mode", ["sigmoid", "softmax"])
def test_dice_region_parity(region, mode):
    ref = _ref_metrics()
    rng = np.random.RandomState(1)
    c = 3 if mode == "sigmoid" else 4
    p = _blob(rng, (2, c, 10, 12, 11))
    if mode == "sigmoid":
        t = (rng.rand(2, c, 10, 12, 11) > 0.6).astype(np.float32)
    else:
        lab = rng.randint(0, 4, size=(2, 10, 12, 11))
        t = np.moveaxis(np.eye(4, dtype=np.float32)[lab], -1, 1)
    import torch

    t_val = float(ref.DiceRegion()(torch.from_numpy(p), torch.from_numpy(t),
                                   region=region, mode=mode))
    j_val = float(dice_region(jnp.asarray(np.moveaxis(p, 1, -1)),
                              jnp.asarray(np.moveaxis(t, 1, -1)),
                              region=region, mode=mode))
    np.testing.assert_allclose(t_val, j_val, rtol=1e-5)


def test_mean_iou_parity():
    ref = _ref_metrics()
    rng = np.random.RandomState(2)
    p = _blob(rng, (2, 4, 8, 9, 7))
    lab = rng.randint(0, 4, size=(2, 8, 9, 7))
    t = np.moveaxis(np.eye(4, dtype=np.float32)[lab], -1, 1)
    import torch

    t_val = float(ref.MeanIoU()(torch.from_numpy(p), torch.from_numpy(t)))
    j_val = float(mean_iou(jnp.asarray(np.moveaxis(p, 1, -1)),
                           jnp.asarray(np.moveaxis(t, 1, -1))))
    np.testing.assert_allclose(t_val, j_val, rtol=1e-5)


def test_hd95_surface_machinery_parity():
    """Our hd95 (Sobel surfaces -> KDTree -> 95th pct, both directions) vs
    the reference's machinery (getHausdorff_KD, metrics.py:190-308).

    DOCUMENTED DEVIATION (intended-math policy): the reference's
    get_surface_points passes an UNBATCHED (D,H,W) mask to F.conv3d, so its
    `.abs().sum(1)` reduces the DEPTH axis instead of the 3 kernel channels
    and 'surface points' come out as (kernel_idx, y, x) pseudo-coordinates
    with kernel_idx in {0,1,2} — a depth-collapsed projection, not a
    surface. This test therefore drives the reference's conv with the
    evidently-intended batched (1,1,D,H,W) input (only that one call fixed;
    kernels/sum/KDTree/percentile all the reference's) and asserts our hd95
    matches THAT bit-for-bit, surface sets included."""
    ref = _ref_metrics()
    rng = np.random.RandomState(3)
    import torch
    import torch.nn.functional as F

    from xlstm_hved_tpu.metrics import _surface_points

    gh = ref.getHausdorff_KD()

    def ref_surface_intended(m):
        t = torch.from_numpy(m).unsqueeze(0).unsqueeze(0)
        s = (F.conv3d(t, gh.get_sobel_kernel(), padding=1)
             .abs().sum(1).bool().squeeze(0))
        return s.nonzero().numpy().astype(float)

    for trial in range(3):
        a = np.zeros((12, 14, 13), np.float32)
        b = np.zeros((12, 14, 13), np.float32)
        az, ay, ax = rng.randint(2, 6, 3)
        a[az:az + 5, ay:ay + 6, ax:ax + 5] = 1
        bz, by, bx = rng.randint(2, 6, 3)
        b[bz:bz + 4, by:by + 5, bx:bx + 6] = 1

        s1, s2 = ref_surface_intended(a), ref_surface_intended(b)
        assert (set(map(tuple, s1.astype(int)))
                == set(map(tuple, np.asarray(_surface_points(a > 0.5), int))))
        t_val = gh.hausdorff_distance_95(s1, s2)
        j_val = hd95(a, b)
        np.testing.assert_allclose(float(t_val), j_val, rtol=1e-6,
                                   err_msg=f"trial {trial}")


def test_hd95_empty_and_sentinel():
    """Empty surface set -> 0.0, matching the reference's guard
    (metrics.py:252-254)."""
    a = np.zeros((8, 8, 8), np.float32)
    b = np.zeros((8, 8, 8), np.float32)
    b[2:5, 2:5, 2:5] = 1
    assert hd95(a, b) == 0.0
