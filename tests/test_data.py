"""Data-layer tests: NIfTI round-trip, synthetic BraTS loader, modality
dropout semantics, on-device augmentation pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xlstm_hved_tpu.data.brats import BraTSDataset, prefetch_loader
from xlstm_hved_tpu.data.nifti import read_nifti, write_nifti
from xlstm_hved_tpu.data.synthetic import write_synthetic_dataset
from xlstm_hved_tpu.data.transforms import (
    background_info,
    device_augment,
    device_eval_transform,
    host_seg_to_mask,
    host_zscore_nonzero,
    seg_to_mask,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    for dtype in (np.float32, np.int16, np.uint8):
        vol = (rng.rand(7, 9, 5) * 100).astype(dtype)
        p = str(tmp_path / f"x_{dtype.__name__}.nii.gz")
        write_nifti(p, vol)
        back, affine = read_nifti(p)
        np.testing.assert_allclose(back, vol.astype(np.float32))
        assert affine.shape == (4, 4)
    # uncompressed too
    vol = rng.rand(4, 4, 4).astype(np.float32)
    p = str(tmp_path / "y.nii")
    write_nifti(p, vol)
    back, _ = read_nifti(p)
    np.testing.assert_allclose(back, vol)


def test_synthetic_dataset_and_loader(tmp_path):
    root = write_synthetic_dataset(str(tmp_path / "brats"), n_subjects=2,
                                   shape=(16, 16, 16))
    ds = BraTSDataset(root, m_full=True, seed=0)
    assert len(ds) == 2
    img, labels, keep, bg = ds.load(0)
    assert img.shape == (16, 16, 16, 4)
    assert labels.shape == (16, 16, 16)
    assert set(np.unique(labels)).issubset({0, 1, 2, 3})
    assert keep.any()
    batches = list(prefetch_loader(ds, batch_size=1, epochs=1, seed=1))
    assert len(batches) == 2


def test_prefetch_loader_host_sharding(tmp_path):
    """shard=(pid, n) slices the identically-shuffled order disjointly —
    the per-host data loading contract for multi-host data parallelism."""
    root = write_synthetic_dataset(str(tmp_path / "brats"), n_subjects=4,
                                   shape=(16, 16, 16))
    ds = BraTSDataset(root, m_full=True, seed=0)

    def first_voxels(shard):
        out = []
        for batch in prefetch_loader(ds, batch_size=1, epochs=1, seed=3,
                                     shuffle=True, shard=shard):
            img = batch[0][0]
            out.append(float(np.sum(img)))  # content fingerprint
        return out

    host0 = first_voxels((0, 2))
    host1 = first_voxels((1, 2))
    assert len(host0) == 2 and len(host1) == 2
    both = host0 + host1
    assert len(set(both)) == 4  # disjoint, covering all subjects
    assert sorted(both) == sorted(first_voxels(None))


def test_modality_dropout_semantics():
    ds = BraTSDataset.__new__(BraTSDataset)
    ds.rng = np.random.RandomState(0)
    ds.m_full = False
    keeps = np.stack([ds.sample_keep() for _ in range(200)])
    assert keeps.any(axis=1).all()          # at least one modality kept
    assert (~keeps).any(axis=1).all()       # m_full=False: at least 1 dropped
    ds.m_full = True
    keeps = np.stack([ds.sample_keep() for _ in range(200)])
    assert keeps.any(axis=1).all()
    assert keeps.all(axis=1).any()          # full-modality samples do occur


def test_seg_to_mask_nesting():
    labels = jnp.asarray([[0, 1], [2, 3]])[None].repeat(2, 0)  # (2,2,2)
    m = np.asarray(seg_to_mask(labels))
    # WT = m>0, TC = {1,2,3}, ET = {1}
    np.testing.assert_array_equal(m[..., 0], np.asarray(labels) > 0)
    np.testing.assert_array_equal(m[..., 1], np.isin(np.asarray(labels), [1, 2, 3]))
    np.testing.assert_array_equal(m[..., 2], np.asarray(labels) == 1)
    np.testing.assert_array_equal(
        m, host_seg_to_mask(np.asarray(labels)))
    # nesting: ET ⊆ TC ⊆ WT
    assert np.all(m[..., 2] <= m[..., 1]) and np.all(m[..., 1] <= m[..., 0])


def test_device_augment_shapes_and_range(rng):
    r = np.random.RandomState(0)
    img = jnp.asarray(r.rand(12, 12, 12, 4) * 255, jnp.float32)
    labels = jnp.asarray(r.randint(0, 4, (12, 12, 12)), jnp.int32)
    out_img, out_mask = device_augment(rng, img, labels, crop=(8, 8, 8))
    assert out_img.shape == (8, 8, 8, 4)
    assert out_mask.shape == (8, 8, 8, 3)
    assert float(out_img.max()) <= 1.3  # /255 + small shift
    # deterministic for fixed key
    out2, _ = device_augment(rng, img, labels, crop=(8, 8, 8))
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(out2))
    # eval path is center-cropped and deterministic
    e1, m1 = device_eval_transform(img, labels, crop=(8, 8, 8))
    e2, m2 = device_eval_transform(img, labels, crop=(8, 8, 8))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_zscore_and_background_info():
    r = np.random.RandomState(0)
    img = np.zeros((2, 10, 10, 10), np.float32)
    img[:, 3:7, 2:8, 4:9] = r.rand(2, 4, 6, 5) * 50 + 10
    z = host_zscore_nonzero(img)
    nz = img[0] != 0
    assert abs(z[0][nz].mean()) < 1e-4 and abs(z[0][nz].std() - 1) < 1e-3
    assert np.all(z[0][~nz] == 0)
    lo = background_info(img)
    np.testing.assert_array_equal(lo, [3, 2, 4])
    lo_padded = background_info(img, patch_size=(8, 8, 8))
    assert np.all(lo_padded <= [2, 2, 2])
