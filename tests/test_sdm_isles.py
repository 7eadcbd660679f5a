"""Tests for the --sdm boundary-loss wiring and the ISLES HDF5 dataset
(reference optional paths: loss.py:136-146 + utils.py:217-257, and ISLESset
BraTSdataset.py:176-273)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_hved_tpu.config import TrainConfig
from xlstm_hved_tpu.data.sdm import compute_sdm
from xlstm_hved_tpu.engine.train import create_train_state, make_train_step
from xlstm_hved_tpu.losses import boundary_loss
from xlstm_hved_tpu.models import Discriminator, find_model_using_name

S = 16


def test_compute_sdm_properties():
    seg = np.zeros((1, 8, 8, 8, 2), bool)
    seg[0, 2:6, 2:6, 2:6, 0] = True  # cube in channel 0; channel 1 empty
    sdm = compute_sdm(seg)
    assert sdm.shape == seg.shape
    # negative inside, positive outside, zero on the inner boundary
    assert sdm[0, 4, 4, 4, 0] < 0
    assert sdm[0, 0, 0, 0, 0] > 0
    assert sdm[0, 2, 4, 4, 0] == 0.0     # boundary voxel
    assert np.all(sdm[..., 1] == 0)       # empty channel stays zero
    assert np.all(np.abs(sdm) <= 1.0 + 1e-6)


def test_boundary_loss_prefers_inside():
    sdm = jnp.asarray(compute_sdm(
        np.pad(np.ones((1, 4, 4, 4, 1), bool),
               ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0)))))
    inside = (sdm < 0).astype(jnp.float32)
    outside = (sdm > 0).astype(jnp.float32)
    assert float(boundary_loss(inside, sdm)) < float(boundary_loss(outside, sdm))


@pytest.mark.slow
def test_train_step_with_sdm():
    model = find_model_using_name("U_HVEDConvNet3D")
    disc = Discriminator(f_maps=8, kernel=3)
    cfg = TrainConfig(crop_size=(S, S, S), num_epochs=10, use_sdm=True,
                      weight_bd=0.5)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(1, S, S, S, 4), jnp.float32)
    mask = (jnp.asarray(r.rand(1, S, S, S, 3)) > 0.7).astype(jnp.float32)
    sdm = jnp.asarray(compute_sdm(np.asarray(mask) > 0.5))
    state, _ = create_train_state(model, disc, cfg, jax.random.PRNGKey(0), x)
    step = make_train_step(model, disc, cfg)
    state, m = step(state, x, mask, jax.random.PRNGKey(1), sdm)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["bd"])) and float(m["bd"]) != 0.0


def _make_isles_h5(path, n=6):
    import h5py

    r = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=r.rand(n, 4, 12, 12, 12).astype(
            np.float32) * 100.0)
        f.create_dataset("masks", data=(r.rand(n, 12, 12, 12) > 0.8).astype(
            np.uint8))
    return path


def test_isles_dataset_semantics(tmp_path):
    from xlstm_hved_tpu.data.brats import ISLESDataset

    path = _make_isles_h5(str(tmp_path / "isles.h5"))
    ds = ISLESDataset(path, m_full=False, seed=3)
    assert len(ds) == 6
    img, lab, keep, bg = ds.load(0)
    assert img.shape == (12, 12, 12, 4) and lab.shape == (12, 12, 12)
    assert keep.dtype == bool and keep.shape == (4,)
    # z-score: non-background voxels of each channel ~N(0,1)
    ch = img[..., 0]
    nz = ch[np.abs(ch) > 1e-8]
    assert abs(nz.mean()) < 0.3 and abs(nz.std() - 1.0) < 0.3

    # dropout semantics over many draws: >=1 kept, >=1 dropped (m_full=False),
    # marginal keep rate balanced around the Bernoulli(0.5) reference
    keeps = np.stack([ds.sample_keep() for _ in range(500)])
    assert keeps.any(axis=1).all()
    assert (~keeps).any(axis=1).all()
    rate = keeps.mean()
    assert 0.3 < rate < 0.6

    ds_full = ISLESDataset(path, m_full=True, seed=4)
    keeps = np.stack([ds_full.sample_keep() for _ in range(500)])
    assert keeps.any(axis=1).all()
    assert keeps.all(axis=1).any()  # full subset reachable when m_full


def test_make_datasets_isles(tmp_path):
    from xlstm_hved_tpu.cli.common import base_parser, make_datasets

    path = _make_isles_h5(str(tmp_path / "isles.h5"))
    args = base_parser("t").parse_args(
        ["--dataset", "isles", "--h5_path", path])
    train, valid = make_datasets(args)
    assert len(train) == 4 and len(valid) == 2
    assert not train.m_full and valid.m_full
