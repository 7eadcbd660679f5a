"""Host-transform parity against the ACTUAL reference transform.py
(imported with torchvision/skimage stubs). The reference draws from the
GLOBAL numpy RNG; each test seeds it identically for both sides and passes
`np.random` as our rng so the draw sequences align."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_loader import load_reference  # noqa: E402

from xlstm_hved_tpu.data.transforms import (  # noqa: E402
    host_add_gaussian_noise,
    host_random_rotate90,
    host_random_scale,
)


def _ref_transform():
    load_reference()
    import transform as ref_transform  # noqa: E402

    return ref_transform


def _vol(rng, shape=(4, 12, 14, 13)):
    img = np.zeros(shape, np.float32)
    img[:, 2:10, 3:12, 2:11] = rng.rand(4, 8, 9, 9).astype(np.float32) + 0.2
    mask = np.zeros(shape[1:], np.float32)
    mask[4:8, 5:9, 4:8] = rng.randint(1, 4, (4, 4, 4)).astype(np.float32)
    return img, mask


def test_gaussian_noise_parity():
    ref = _ref_transform()
    img, _ = _vol(np.random.RandomState(0))
    np.random.seed(7)
    t_out = ref.AddGaussianNoise(mean=0.1, std=0.05)(img.copy())
    np.random.seed(7)
    j_out = host_add_gaussian_noise(np.random, img, mean=0.1, std=0.05)
    np.testing.assert_allclose(t_out, j_out, atol=0)


def test_rotate90_parity():
    ref = _ref_transform()
    img, mask = _vol(np.random.RandomState(1))
    for seed in range(4):
        np.random.seed(seed)
        t_img, t_mask = ref.RandomRotate90()((img.copy(), mask.copy()))
        np.random.seed(seed)
        j_img, j_mask = host_random_rotate90(np.random, img, mask)
        np.testing.assert_array_equal(t_img, j_img)
        np.testing.assert_array_equal(t_mask, j_mask)


def test_scale_zoom_parity():
    """Both the shrink (center-pad with corner value) and grow (center-crop)
    branches of the reference Scale (transform.py:48-96)."""
    ref = _ref_transform()
    img, mask = _vol(np.random.RandomState(2))
    hit = set()
    for seed in range(6):
        np.random.seed(seed)
        t_img, t_mask = ref.Scale(0.3)((img.copy(), mask.copy()))
        np.random.seed(seed)
        factor_preview = np.random.uniform(0.7, 1.3)
        hit.add("shrink" if factor_preview < 1 else "grow")
        np.random.seed(seed)
        j_img, j_mask = host_random_scale(np.random, img, mask, scale=0.3)
        np.testing.assert_allclose(t_img, j_img, atol=0,
                                   err_msg=f"seed {seed}")
        np.testing.assert_array_equal(t_mask, j_mask)
    assert hit == {"shrink", "grow"}, hit
