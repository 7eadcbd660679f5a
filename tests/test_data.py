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
    assert set(np.unique(labels)).issubset({0, 1, 2, 3, 4})
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


def _brainlike(rng, shape=(4, 40, 52, 44), blob=None):
    """Random volume with a nonzero 'brain' blob on a zero background."""
    img = np.zeros(shape, np.float32)
    d, h, w = shape[1:]
    if blob is None:
        blob = (slice(8, 30), slice(10, 40), slice(6, 38))
    img[(slice(None),) + blob] = rng.rand(
        4, blob[0].stop - blob[0].start, blob[1].stop - blob[1].start,
        blob[2].stop - blob[2].start).astype(np.float32) + 0.1
    return img


def test_extract_brain_matches_reference():
    """Our host extract_brain reproduces the reference's dynamic crop
    bit-for-bit (BraTSdataset.py:85-153), including the pad-to-patch_size
    widening with min clamped at 0 and overflow pushed onto max."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ref_loader import load_reference_dataset
    from xlstm_hved_tpu.data.transforms import extract_brain

    ref = load_reference_dataset()
    rng = np.random.RandomState(0)
    cases = [
        # big brain: no padding path
        _brainlike(rng, (4, 130, 140, 150),
                   blob=(slice(5, 125), slice(8, 128), slice(10, 130))),
        # small centered brain: all axes widen to 112
        _brainlike(rng),
        # brain hugging the origin: min-clamp + overflow path
        _brainlike(rng, (4, 120, 120, 120),
                   blob=(slice(0, 20), slice(0, 30), slice(2, 40))),
        # brain hugging the far corner: max exceeds bounds, numpy clamps
        _brainlike(rng, (4, 120, 120, 120),
                   blob=(slice(100, 120), slice(90, 120), slice(95, 119))),
    ]
    for i, img in enumerate(cases):
        mask = (rng.rand(*img.shape[1:]) > 0.5).astype(np.float32)
        ri, rm = ref.extract_brain((img.copy(), mask.copy()))
        oi, om = extract_brain(img, mask)
        assert ri.shape == oi.shape, (i, ri.shape, oi.shape)
        np.testing.assert_array_equal(ri, oi)
        np.testing.assert_array_equal(rm, om)


def test_zscore_ref_matches_reference_normalize():
    from ref_loader import load_reference_dataset
    from xlstm_hved_tpu.data.transforms import host_zscore_ref

    ref = load_reference_dataset()
    rng = np.random.RandomState(1)
    img = _brainlike(rng, (4, 24, 28, 26), blob=(slice(4, 20), slice(6, 24),
                                                 slice(2, 22)))
    np.testing.assert_allclose(ref.normalize(img.copy()),
                               host_zscore_ref(img), rtol=0, atol=1e-5)


def test_brats_validation_set(tmp_path):
    """GBMValidset semantics: (4,W,H,D)->(4,D,H,W) transpose, extract+pad,
    reference z-score, and the dropout rule guaranteeing >=1 kept AND >=1
    dropped modality on every draw (BraTSdataset.py:480-511)."""
    import h5py
    from xlstm_hved_tpu.data.brats import BraTSValidationSet

    rng = np.random.RandomState(2)
    vols = np.zeros((3, 4, 130, 124, 118), np.float32)   # (N, 4, W, H, D)
    vols[:, :, 5:125, 4:120, 3:115] = rng.rand(3, 4, 120, 116, 112) + 0.1
    p = str(tmp_path / "valid.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("images", data=vols)

    ds = BraTSValidationSet(p, seed=0, pad_multiple=16)
    assert len(ds) == 3
    img, lab, keep, bg = ds.load(0)
    assert img.ndim == 4 and img.shape[-1] == 4
    assert all(s % 16 == 0 for s in img.shape[:3])
    assert lab.shape == img.shape[:3] and lab.max() == 0
    # transpose check: D axis of the item == last axis of the HDF5 layout
    assert img.shape[0] >= 112 and img.shape[2] >= 112
    for _ in range(64):
        k = ds.sample_keep()
        assert k.any() and not k.all()


def test_make_datasets_brats_valid(tmp_path):
    import argparse

    import h5py
    from xlstm_hved_tpu.cli.common import make_datasets
    from xlstm_hved_tpu.data.brats import BraTSValidationSet

    p = str(tmp_path / "v.h5")
    with h5py.File(p, "w") as f:
        f.create_dataset("images", data=np.zeros((1, 4, 8, 8, 8), np.float32))
    args = argparse.Namespace(dataset="brats_valid", h5_path=p, seed=0,
                              train_dir="", valid_dir="")
    tr, va = make_datasets(args)
    assert isinstance(va, BraTSValidationSet) and tr is va


def test_host_augment_matches_device_semantics():
    """host_augment mirrors device_augment's pipeline: same shapes, /255
    range, nested mask channels, and determinism under a fixed rng. The
    host version exists so train steps ship only the crop over the
    host->device link (cli/common.py::assemble_train_batch)."""
    from xlstm_hved_tpu.data.transforms import host_augment

    rng = np.random.RandomState(0)
    img = (rng.rand(20, 24, 22, 4) * 255).astype(np.float32)
    lab = rng.randint(0, 4, (20, 24, 22)).astype(np.int32)
    x1, m1 = host_augment(np.random.RandomState(5), img, lab, (16, 16, 16))
    x2, m2 = host_augment(np.random.RandomState(5), img, lab, (16, 16, 16))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(m1, m2)
    assert x1.shape == (16, 16, 16, 4) and x1.dtype == np.float32
    assert m1.shape == (16, 16, 16, 3) and m1.dtype == np.uint8
    assert x1.max() <= 1.3 and x1.min() >= -0.3  # /255 + small shift
    # nesting: ET (ch2) subset of TC (ch1) subset of WT (ch0)
    assert np.all(m1[..., 2] <= m1[..., 1])
    assert np.all(m1[..., 1] <= m1[..., 0])


def test_host_eval_transform_equals_device():
    from xlstm_hved_tpu.data.transforms import (device_eval_transform,
                                                host_eval_transform)

    rng = np.random.RandomState(1)
    img = (rng.rand(20, 24, 22, 4) * 255).astype(np.float32)
    lab = rng.randint(0, 4, (20, 24, 22)).astype(np.int32)
    hx, hm = host_eval_transform(img, lab, crop=(16, 16, 16))
    dx, dm = device_eval_transform(jnp.asarray(img), jnp.asarray(lab),
                                   crop=(16, 16, 16))
    np.testing.assert_allclose(hx, np.asarray(dx), atol=1e-6)
    np.testing.assert_array_equal(hm.astype(np.float32), np.asarray(dm))
