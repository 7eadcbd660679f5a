"""Import reference (PyTorch) XLSTM-HVED checkpoints into this framework.

The reference trains with torch and saves ``{'model_sd': state_dict, ...}``
checkpoints (/root/reference/utils.py:102-166, train.py:370-397). This
module maps such a state_dict onto the flax param tree of
models/hved.py::HVEDFusionNet so users migrating from the reference can
reuse trained weights directly — and so the test suite can transplant
randomly-initialized reference weights and assert forward equality
(cross-implementation accuracy parity).

Layout translation rules:
- torch Conv3d weight (Cout, Cin, kd, kh, kw) -> flax kernel
  (kd, kh, kw, Cin, Cout);
- the reference's per-modality ModuleList copies (4 streams) fold into
  BlockDiagConv kernels (M, kd, kh, kw, cin, cout);
- torch grouped convs (groups=G) fold the same way: group-major output
  channel order on both sides;
- torch Linear weight (out, in) -> flax Dense kernel (in, out);
- torch BatchNorm3d {weight, bias, running_mean, running_var} -> flax
  BatchNorm {scale, bias} params + {mean, var} batch_stats.

Supported model families: the MVAE zoo (DoubleConv and ExtResNetBlock basic
modules, DuSFE variants, the ViL/skr flagship), U_HeMIS, the Discriminator,
and the UxLSTM nnU-Net nets (uxlstm_params_from_torch).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from xlstm_hved_tpu.config import HVEDConfig


def _t(w) -> np.ndarray:
    """torch conv3d weight -> flax conv kernel."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 4, 1, 0))


def _lin(w) -> np.ndarray:
    """torch Linear weight -> flax Dense kernel."""
    return np.ascontiguousarray(np.asarray(w).T)


def _grouped(w, groups: int) -> np.ndarray:
    """torch grouped conv weight (G*cout, cin_g, kd, kh, kw) -> BlockDiagConv
    kernel (G, kd, kh, kw, cin_g, cout). Torch orders output channels
    group-major, matching the folded channel-block layout."""
    co, ci, kd, kh, kw = np.asarray(w).shape
    assert co % groups == 0, (co, groups)
    return np.ascontiguousarray(
        np.asarray(w).reshape(groups, co // groups, ci, kd, kh, kw)
        .transpose(0, 3, 4, 5, 2, 1))


def _conv(sd, key, bias=True) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{key}.weight"])}
    if bias:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _stacked_conv(sd, key_fn, streams: int) -> Dict[str, np.ndarray]:
    """Fold per-stream torch convs into one BlockDiagConv param group."""
    ws = [_t(sd[f"{key_fn(m)}.weight"]) for m in range(streams)]
    bs = [np.asarray(sd[f"{key_fn(m)}.bias"]) for m in range(streams)]
    return {"kernel": np.stack(ws), "bias": np.stack(bs)}


def _sub_names(module: str) -> Tuple[str, str]:
    """torch child names of the two convs in a basic module: DoubleConv has
    SingleConv1/SingleConv2 (buildingblocks.py:464-507), ExtResNetBlock has
    conv1/conv2 (:558-604). Both flax counterparts use conv1/conv2."""
    if module == "ext_resnet":
        return "conv1", "conv2"
    return "SingleConv1", "SingleConv2"


def _basic_folded(sd, key_fmt, streams: int,
                  module: str = "double_conv") -> Dict:
    """Per-stream torch basic module -> BlockDiag{DoubleConv,ExtResNetBlock}
    params (same flax structure either way)."""
    s1, s2 = _sub_names(module)
    return {
        "conv1": {"conv": _stacked_conv(
            sd, lambda m: f"{key_fmt(m, s1)}.conv", streams)},
        "conv2": {"conv": _stacked_conv(
            sd, lambda m: f"{key_fmt(m, s2)}.conv", streams)},
    }


def _double_conv_folded(sd, prefix: str, key_fmt, streams: int) -> Dict:
    """Per-stream torch DoubleConv -> BlockDiagDoubleConv params."""
    return _basic_folded(sd, key_fmt, streams)


def _basic_plain(sd, key: str, module: str = "double_conv") -> Dict:
    """torch basic module -> my DoubleConv/ExtResNetBlock (SingleConv
    children conv1/conv2, each one auto-named Conv3DFast_0)."""
    s1, s2 = _sub_names(module)
    return {
        "conv1": {"Conv3DFast_0": _conv(sd, f"{key}.{s1}.conv")},
        "conv2": {"Conv3DFast_0": _conv(sd, f"{key}.{s2}.conv")},
    }


def _double_conv_plain(sd, key: str) -> Dict:
    return _basic_plain(sd, key)


def _atten2(sd, key: str) -> Dict:
    """torch AttenModule2 (buildingblocks.py:259-301) -> my AttenModule2.
    enc_spatial is Conv3d(4, 16, 7, groups=4); seg_spatial Conv3d(2, 8, 7,
    groups=2); the *2 convs are pointwise."""
    return {
        "enc_spatial": {
            "kernel": _grouped(sd[f"{key}.enc_spatial.weight"], 4),
            "bias": np.asarray(sd[f"{key}.enc_spatial.bias"]).reshape(4, -1),
        },
        "enc_spatial2": _conv(sd, f"{key}.enc_spatial2"),
        "seg_spatial": {
            "kernel": _grouped(sd[f"{key}.seg_spatial.weight"], 2),
            "bias": np.asarray(sd[f"{key}.seg_spatial.bias"]).reshape(2, -1),
        },
        "seg_spatial2": _conv(sd, f"{key}.seg_spatial2"),
    }


def _duse(sd, key: str) -> Tuple[Dict, Dict]:
    """torch DuSEAttention (modules/DuSFE.py:89-155) -> (params,
    batch_stats) for my DuSEAttention. The reference's conv_fuse_ch*/
    bn adjuncts that its forward never uses are skipped."""
    params = {
        "fc_comb": {"kernel": _lin(sd[f"{key}.fc_comb.weight"]),
                    "bias": np.asarray(sd[f"{key}.fc_comb.bias"])},
        "fc_ch1": {"kernel": _lin(sd[f"{key}.fc_ch1.weight"]),
                   "bias": np.asarray(sd[f"{key}.fc_ch1.bias"])},
        "fc_ch2": {"kernel": _lin(sd[f"{key}.fc_ch2.weight"]),
                   "bias": np.asarray(sd[f"{key}.fc_ch2.bias"])},
        "conv_squeeze_ch1": _conv(sd, f"{key}.conv_squeeze_ch1"),
        "conv_squeeze_ch2": _conv(sd, f"{key}.conv_squeeze_ch2"),
        "conv_comb": _conv(sd, f"{key}.conv_comb"),
        "conv_adjust_ch1": _conv(sd, f"{key}.conv_adjust_ch1"),
        "conv_adjust_ch2": _conv(sd, f"{key}.conv_adjust_ch2"),
        "bn_fuse_ch1": {"scale": np.asarray(sd[f"{key}.bn_fuse_ch1.weight"]),
                        "bias": np.asarray(sd[f"{key}.bn_fuse_ch1.bias"])},
        "bn_fuse_ch2": {"scale": np.asarray(sd[f"{key}.bn_fuse_ch2.weight"]),
                        "bias": np.asarray(sd[f"{key}.bn_fuse_ch2.bias"])},
    }
    stats = {
        "bn_fuse_ch1": {
            "mean": np.asarray(sd[f"{key}.bn_fuse_ch1.running_mean"]),
            "var": np.asarray(sd[f"{key}.bn_fuse_ch1.running_var"])},
        "bn_fuse_ch2": {
            "mean": np.asarray(sd[f"{key}.bn_fuse_ch2.running_mean"]),
            "var": np.asarray(sd[f"{key}.bn_fuse_ch2.running_var"])},
    }
    return params, stats


def _tnd(w) -> np.ndarray:
    """torch convNd weight (Cout, Cin, *k) -> flax kernel (*k, Cin, Cout);
    rank-generic (2D and 3D UxLSTM twins share one mapper)."""
    a = np.asarray(w)
    perm = tuple(range(2, a.ndim)) + (1, 0)
    return np.ascontiguousarray(a.transpose(perm))


def _convnd(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _tnd(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _conv1d_depthwise(w) -> np.ndarray:
    """torch depthwise Conv1d weight (C, 1, k) -> flax nn.Conv kernel
    (k, 1, C) with feature_group_count=C."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _vil3d(sd, key: str) -> Dict:
    """torch UxLSTMEnc_3d.ViLLayer wrapper (-> ViLBlock -> inner ViLLayer,
    vision_lstm.py:351-506) -> my ViLLayer3D params. The wrapper's unused
    nn.LayerNorm (`{key}.norm`, never called in forward_patch_token) is
    dropped."""
    lk = f"{key}.vil.layer"
    return {"vil": {
        "norm": {"weight": np.asarray(sd[f"{key}.vil.norm.weight"])},
        "layer": {
            "proj_up": {"kernel": _lin(sd[f"{lk}.proj_up.weight"])},
            "q_proj": {"weight": np.asarray(sd[f"{lk}.q_proj.weight"])},
            "k_proj": {"weight": np.asarray(sd[f"{lk}.k_proj.weight"])},
            "v_proj": {"weight": np.asarray(sd[f"{lk}.v_proj.weight"])},
            "conv1d": {"conv": {
                "kernel": _conv1d_depthwise(sd[f"{lk}.conv1d.conv.weight"]),
                "bias": np.asarray(sd[f"{lk}.conv1d.conv.bias"])}},
            "mlstm_cell": {
                "igate": {"kernel": _lin(sd[f"{lk}.mlstm_cell.igate.weight"]),
                          "bias": np.asarray(sd[f"{lk}.mlstm_cell.igate.bias"])},
                "fgate": {"kernel": _lin(sd[f"{lk}.mlstm_cell.fgate.weight"]),
                          "bias": np.asarray(sd[f"{lk}.mlstm_cell.fgate.bias"])},
                "outnorm": {"weight": np.asarray(
                    sd[f"{lk}.mlstm_cell.outnorm.weight"])},
            },
            "learnable_skip": np.asarray(sd[f"{lk}.learnable_skip"]),
            "proj_down": {"kernel": _lin(sd[f"{lk}.proj_down.weight"])},
        },
    }}


def _dwconvnorm(sd, key: str) -> Tuple[Dict, Dict]:
    """torch DWConvNorm (sa_module.py:56-97: depthwise conv + pointwise conv
    + BatchNorm) -> (params, batch_stats) for my DWConvNorm."""
    dw = np.asarray(sd[f"{key}.dwconv.weight"])
    params = {
        "dwconv": {"kernel": _grouped(dw, dw.shape[0])},
        "pwconv": {"kernel": _t(sd[f"{key}.pwconv.weight"]),
                   "bias": np.asarray(sd[f"{key}.pwconv.bias"])},
        "BatchNorm_0": {"scale": np.asarray(sd[f"{key}.norm.weight"]),
                        "bias": np.asarray(sd[f"{key}.norm.bias"])},
    }
    stats = {"BatchNorm_0": {
        "mean": np.asarray(sd[f"{key}.norm.running_mean"]),
        "var": np.asarray(sd[f"{key}.norm.running_var"])}}
    return params, stats


def _skr_gate(sd, key: str) -> Tuple[Dict, Dict]:
    """torch Sequential(ResBlock(lkdw=True), SpacialAttention3D(k=1)) — one
    skip-return gate (RA_HVED.py:371-373,382-384) -> my SkrGate (res + sa).

    The reference ResBlock always constructs `identity_mapping`
    (sa_module.py:121) but only applies it when channels or stride change
    (`need_map`, :124); skr gates keep channels so those params are dead
    weight and are deliberately not read."""
    c1p, c1s = _dwconvnorm(sd, f"{key}.0.conv1")
    c2p, c2s = _dwconvnorm(sd, f"{key}.0.conv2")
    params = {"res": {"conv1": c1p, "conv2": c2p},
              "sa": {"conv": {"kernel": _t(sd[f"{key}.1.conv.weight"])}}}
    stats = {"res": {"conv1": c1s, "conv2": c2s}}
    return params, stats


def _double_conv_vil(sd, key: str) -> Dict:
    """torch DoubleConv_ViL (buildingblocks.py:509-555) -> my DoubleConvViL
    (double_conv + vil submodules)."""
    return {
        "double_conv": _double_conv_plain(sd, key),
        "vil": _vil3d(sd, f"{key}.ViL"),
    }


def hved_params_from_torch(sd: Dict[str, np.ndarray], cfg: HVEDConfig
                           ) -> Tuple[Dict, Dict]:
    """Convert a reference AbstractFusion3DUNet state_dict into
    (params, batch_stats) for HVEDFusionNet under `cfg`.

    `sd` values may be torch tensors or numpy arrays. The returned trees
    match jax.eval_shape(model.init) for the same cfg (asserted by
    tests/test_torch_parity.py).
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    if cfg.basic_module not in ("double_conv", "ext_resnet"):
        raise NotImplementedError(
            f"torch import: unsupported basic_module={cfg.basic_module!r}")
    if not cfg.mvae or not cfg.mvae_reduction:
        raise NotImplementedError(
            "torch import currently requires the MVAE+reduction zoo config "
            "(the fusion family is mapped by fusion_params_from_torch)")
    bm = cfg.basic_module
    ext = bm == "ext_resnet"

    M = cfg.multi_stream
    L = cfg.num_levels
    n_dec = L - 1
    p: Dict = {}
    stats: Dict = {}

    p["init_blocks"] = _stacked_conv(sd, lambda m: f"init_blocks.{m}.0", M)

    n_ms = min(cfg.fusion_level, L)  # multistream levels
    for i in range(L):
        if i >= n_ms:
            # Single-stream deep level (fusion_level < num_levels): the
            # reference stores a bare Encoder at encoders.{i}
            # (RA_HVED.py:338-346,414-418). Its construction-time DRB/VU/
            # conv_block twins at this level (DRBs.{i}.0, VU_blocks.{i},
            # conv_blocks.{i}) are unreachable by the reference forward
            # (only multistream levels enter the MVAE block,
            # RA_HVED.py:546-603) and have no counterpart here.
            blocks = {}
            for b in range(cfg.num_block[i]):
                blocks[f"block{b}"] = _basic_plain(
                    sd, f"encoders.{i}.basic_module.{b}", bm)
            p[f"encoders_{i}"] = blocks
            continue
        blocks = {}
        for b in range(cfg.num_block[i]):
            blocks[f"block{b}"] = _basic_folded(
                sd,
                lambda m, sc, i=i, b=b: f"encoders.{i}.{m}.basic_module.{b}.{sc}",
                M, bm)
        p[f"encoders_{i}"] = blocks
        p[f"drb_{i}"] = {"conv": _stacked_conv(
            sd, lambda m, i=i: f"DRBs.{i}.{m}.0.conv", M)}
        # VU: BasicConv(latent, dec_f, 1, bias=False) inside a Sequential
        p[f"vu_{i}"] = {"conv": {
            "kernel": _t(sd[f"VU_blocks.{i}.0.conv.weight"])}}
        # depthwise 3^3 conv: groups == channels
        w = sd[f"conv_blocks.{i}.conv.weight"]
        p[f"conv_block_{i}"] = {"conv": {"kernel": _grouped(w, w.shape[0])}}

    for j in range(n_dec):
        if cfg.vil_decoder and j < 1:
            basic = _double_conv_vil(sd, f"decoders.{j}.basic_module")
        else:
            basic = _basic_plain(sd, f"decoders.{j}.basic_module", bm)
        p[f"sdecoder_{j}"] = {
            "atten": _atten2(sd, f"decoders.{j}.atten_module"),
            "basic": basic}
        if ext:
            # ResNet decoder upsampling carries a 1x1 pre-conv
            # (buildingblocks.py:692-698,759-763)
            p[f"sdecoder_{j}"]["pre_conv"] = _conv(
                sd, f"decoders.{j}.upsampling.conv1")

    p["final_conv"] = _conv(sd, "final_conv")

    rec_streams = 1 if cfg.shared_recon else M
    if cfg.seg_recon_decoder:
        base = "srdecoder"
        for m in range(rec_streams):
            for j in range(n_dec):
                p[f"rdecoder_{m}_{j}"] = {"basic": _double_conv_plain(
                    sd, f"{base}.multi_decoders.{m}.{j}.basic_module")}
            p[f"rfinal_{m}"] = _conv(sd, f"{base}.rfinals.{m}")
        p["sfinal_0"] = _conv(sd, f"{base}.sfinals.0")
        for j in range(min(n_dec, 3)):
            dp, ds = _duse(sd, f"{base}.dusfe_decoders.{j}")
            p[f"dusfe_{j}"] = dp
            stats[f"dusfe_{j}"] = ds
    elif cfg.recon_decoder:
        for m in range(rec_streams):
            for j in range(n_dec):
                rk = f"rdecoder.multi_decoders.{m}.{j}"
                p[f"rdecoder_{m}_{j}"] = {"basic": _basic_plain(
                    sd, f"{rk}.basic_module", bm)}
                if ext:
                    p[f"rdecoder_{m}_{j}"]["pre_conv"] = _conv(
                        sd, f"{rk}.upsampling.conv1")
            p[f"rfinal_{m}"] = _conv(sd, f"rdecoder.finals.{m}")

    if cfg.mid_vil:
        p["mvil"] = _vil3d(sd, "mViL")
    if cfg.skip_return:
        # The reference builds skr_att/skr_encoders by insert(0, ...) while
        # iterating levels 1..L-1 (RA_HVED.py:369-384), so ModuleList index 0
        # is the DEEPEST module; forward indexes them as skr_att[-level] /
        # skr_encoders[-level] (:552,619). My modules are named by the level
        # at which they run: skr_att_{l} <-> skr_att.{L-l},
        # skr_encoder_{l} <-> skr_encoders.{L-1-l}. skr_att.0 (a gate at the
        # bottleneck width) is never reached by the reference forward (dead
        # params) and is not read.
        p["x0_init"] = _conv(sd, "x0_init.0")
        for level in range(1, L):
            if level < n_ms:
                # gates only exist at multistream levels (the forward gates
                # encoder streams, RA_HVED.py:549-552); deep single-stream
                # levels advance the skr chain but apply no gate.
                gp, gs = _skr_gate(sd, f"skr_att.{L - level}")
                p[f"skr_att_{level}"] = gp
                stats[f"skr_att_{level}"] = gs
            blocks = {}
            for b in range(cfg.num_block[level]):
                blocks[f"block{b}"] = _double_conv_plain(
                    sd, f"skr_encoders.{L - 1 - level}.basic_module.{b}")
            p[f"skr_encoder_{level}"] = blocks
    return p, stats


def hemis_params_from_torch(sd: Dict[str, np.ndarray],
                            streams: int = 4) -> Dict:
    """Convert a reference U_HeMIS state_dict (/root/reference/U_Hemis.py:
    14-168) into params for models.hemis.UHeMIS.

    The per-modality ConvEncoders (enc_list.{m}) map onto the nn.vmap'd
    HemisEncoder: every leaf gains a leading modality axis. Encoder Sequential
    indices: 0 = init BasicConv, 1/3/5/7 = the four ResBlocks (U_Hemis.py:
    70-85); MaxPools carry no params. All BasicConvs are bias-free
    (buildingblocks.py:14 default)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    p: Dict = {}

    enc: Dict = {"init": {"conv": {"kernel": np.stack(
        [_t(sd[f"enc_list.{m}.encoder.0.conv.weight"])
         for m in range(streams)])}}}
    for b, idx in enumerate((1, 3, 5, 7)):
        blk = {}
        for sub, tname in (("conv1", "SingleConv1"), ("conv2", "SingleConv2")):
            base = [f"enc_list.{m}.encoder.{idx}.{tname}.conv"
                    for m in range(streams)]
            blk[sub] = {"Conv3DFast_0": {
                "kernel": np.stack([_t(sd[f"{k}.weight"]) for k in base]),
                "bias": np.stack([np.asarray(sd[f"{k}.bias"]) for k in base]),
            }}
        enc[f"block{b}"] = blk
    p["encoders"] = enc

    def decoder(prefix: str) -> Dict:
        d: Dict = {}
        for j, tname in enumerate(("d3_c1", "d2_c1", "d1_c1")):
            d[f"dec{j}"] = _double_conv_plain(sd, f"{prefix}.{tname}")
        d["final"] = {"conv": {
            "kernel": _t(sd[f"{prefix}.final_conv.conv.weight"])}}
        return d

    for m in range(streams):
        p[f"recon_decoder_{m}"] = decoder(f"recon_decoder_list.{m}")
    p["seg_decoder"] = decoder("seg_decoder")
    return p


def fusion_params_from_torch(sd: Dict[str, np.ndarray], cfg: HVEDConfig
                             ) -> Dict:
    """Convert a reference FusionUNet3D state_dict (the fusion=True non-MVAE
    path, /root/reference/RA_HVED.py:689-700,411-424) into params for
    HVEDFusionNet.

    Dead reference weight deliberately not read: the fusion seg decoders'
    atten_module (the reference's forward crashes calling AttenModule with
    recon_x=None, buildingblocks.py:211-217 — the runnable semantics are the
    plain concat join both sides use)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    assert cfg.fusion and not cfg.mvae, "use hved_params_from_torch for MVAE"
    M = cfg.multi_stream
    L = cfg.num_levels
    n_dec = L - 1
    p: Dict = {}

    p["init_blocks"] = _stacked_conv(sd, lambda m: f"init_blocks.{m}.0", M)
    for i in range(L):
        blocks = {}
        for b in range(cfg.num_block[i]):
            blocks[f"block{b}"] = _basic_folded(
                sd,
                lambda m, sc, i=i, b=b: f"encoders.{i}.{m}.basic_module.{b}.{sc}",
                M, cfg.basic_module)
        p[f"encoders_{i}"] = blocks
        # FusionModule: ModalityGate MLP (shared across avg/max pools) +
        # bias-free 1x1 BasicConv compress (buildingblocks.py:160-186)
        fk = f"FBs.{i}"
        p[f"fusion_{i}"] = {
            "gate": {
                "Dense_0": {"kernel": _lin(sd[f"{fk}.gate.mlp.1.weight"]),
                            "bias": np.asarray(sd[f"{fk}.gate.mlp.1.bias"])},
                "Dense_1": {"kernel": _lin(sd[f"{fk}.gate.mlp.3.weight"]),
                            "bias": np.asarray(sd[f"{fk}.gate.mlp.3.bias"])},
            },
            "compress": {"conv": {
                "kernel": _t(sd[f"{fk}.compress.conv.weight"])}},
        }

    p["last_compress"] = {"conv": {
        "kernel": _t(sd["last_compress.conv.weight"])}}

    for j in range(n_dec):
        p[f"sdecoder_{j}"] = {"basic": _basic_plain(
            sd, f"decoders.{j}.basic_module", cfg.basic_module)}
    p["final_conv"] = _conv(sd, "final_conv")

    rec_streams = 1 if cfg.shared_recon else M
    for m in range(rec_streams):
        for j in range(n_dec):
            p[f"rdecoder_{m}_{j}"] = {"basic": _basic_plain(
                sd, f"rdecoder.multi_decoders.{m}.{j}.basic_module",
                cfg.basic_module)}
        p[f"rfinal_{m}"] = _conv(sd, f"rdecoder.finals.{m}")
    return p


def _inorm_affine(sd, key: str) -> Dict[str, np.ndarray]:
    """torch InstanceNorm{2,3}d(affine=True) -> InstanceNormND params."""
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _ux_basic_res(sd, key: str) -> Dict:
    """reference BasicResBlock (UxLSTMEnc_3d.py:90-127: conv1/norm1/conv2/
    norm2 (+conv3 skip when use_1x1conv)) -> models.uxlstm.ResBlockND."""
    out = {"conv1": _convnd(sd, f"{key}.conv1"),
           "norm1": _inorm_affine(sd, f"{key}.norm1"),
           "conv2": _convnd(sd, f"{key}.conv2"),
           "norm2": _inorm_affine(sd, f"{key}.norm2")}
    if f"{key}.conv3.weight" in sd:
        out["conv3"] = _convnd(sd, f"{key}.conv3")
    return out


def _ux_basic_block_d(sd, key: str) -> Dict:
    """dynamic_network_architectures BasicBlockD (identity-skip residual:
    conv1.{conv,norm} -> conv2.{conv,norm}; the all_modules.* keys alias the
    same tensors) -> ResBlockND without a conv3."""
    return {"conv1": _convnd(sd, f"{key}.conv1.conv"),
            "norm1": _inorm_affine(sd, f"{key}.conv1.norm"),
            "conv2": _convnd(sd, f"{key}.conv2.conv"),
            "norm2": _inorm_affine(sd, f"{key}.conv2.norm")}


def uxlstm_params_from_torch(sd: Dict[str, np.ndarray], model) -> Dict:
    """Convert a reference UXlstmEnc / UXlstmBot state_dict
    (/root/reference/UxLSTM/nnunetv2/nets/UxLSTMEnc_3d.py:427-498,
    UxLSTMBot_3d.py:360-445; 2D twins share the key layout) into params for
    the matching models.uxlstm net.

    Requires conv_bias=True checkpoints (what get_uxlstm_enc_3d_from_plans
    produces, UxLSTMEnc_3d.py:527). With deep_supervision=False the reference
    still creates every seg head but only uses seg_layers[-1] (:385,401);
    the unused heads are dead weight and not read.
    """
    from xlstm_hved_tpu.models.uxlstm import (UXlstmBot, UXlstmEnc,
                                              _nnunet_block_caps,
                                              mixer_schedule)

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    if "encoder.stem.0.conv1.bias" not in sd:
        raise NotImplementedError(
            "uxlstm import requires conv_bias=True checkpoints")
    use_vil = isinstance(model, UXlstmEnc)
    assert use_vil or isinstance(model, UXlstmBot), type(model)
    n_stages = len(model.features_per_stage)
    n_blocks, n_dec = _nnunet_block_caps(
        n_stages, model.n_conv_per_stage, model.n_conv_per_stage_decoder)

    enc: Dict = {"stem_res": _ux_basic_res(sd, "encoder.stem.0")}
    for b in range(n_blocks[0] - 1):
        enc[f"stem_block{b}"] = _ux_basic_block_d(sd, f"encoder.stem.{1 + b}")
    for s in range(n_stages):
        enc[f"stage{s}_res"] = _ux_basic_res(sd, f"encoder.stages.{s}.0")
        for b in range(n_blocks[s] - 1):
            enc[f"stage{s}_block{b}"] = _ux_basic_block_d(
                sd, f"encoder.stages.{s}.{1 + b}")
        if use_vil:
            # per-stage mixer kind differs between the 3D and 2D reference
            # files (see models.uxlstm.mixer_schedule); "none" stages are
            # nn.Identity on the torch side (no params)
            kind = mixer_schedule(n_stages, len(model.input_size))[s]
            if kind == "conv":
                enc[f"mixer{s}"] = _ux_basic_block_d(
                    sd, f"encoder.xlstm_layers.{s}")
            elif kind == "vil":
                enc[f"mixer{s}"] = _vil3d(sd, f"encoder.xlstm_layers.{s}")

    dec: Dict = {}
    for i in range(n_stages - 1):
        dec[f"up{i + 1}_conv"] = _convnd(
            sd, f"decoder.upsample_layers.{i}.conv")
        dec[f"dec{i + 1}_res"] = _ux_basic_res(sd, f"decoder.stages.{i}.0")
        for b in range(n_dec[i] - 1):
            dec[f"dec{i + 1}_block{b}"] = _ux_basic_block_d(
                sd, f"decoder.stages.{i}.{1 + b}")
        if model.deep_supervision:
            dec[f"seg{i + 1}"] = _convnd(sd, f"decoder.seg_layers.{i}")
    if not model.deep_supervision:
        dec[f"seg{n_stages - 1}"] = _convnd(
            sd, f"decoder.seg_layers.{n_stages - 2}")

    p: Dict = {"encoder": enc, "decoder": dec}
    if not use_vil:
        # UXlstmBot: single bottleneck ViL outside the encoder
        # (UxLSTMBot_3d.py:436-440: self.xlstm = ViLLayer(features[-1]))
        p["xlstm"] = _vil3d(sd, "xlstm")
    return p


def disc_params_from_torch(sd: Dict[str, np.ndarray],
                           num_levels: int = 4) -> Dict:
    """Convert a reference Discriminator state_dict (RA_HVED.py:204-236;
    blocks are Sequential[Conv3d, InstanceNorm3d(no params), LeakyReLU],
    buildingblocks.py:342-358) into params for models.hved.Discriminator
    (block{i}.Conv_0 + last)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    p: Dict = {}
    for i in range(num_levels):
        p[f"block{i}"] = {"Conv_0": {
            "kernel": _t(sd[f"disc.{i}.0.weight"]),
            "bias": np.asarray(sd[f"disc.{i}.0.bias"])}}
    p["last"] = {"kernel": _t(sd["last.weight"])}
    return p


def load_reference_checkpoint(path: str, cfg: HVEDConfig) -> Tuple[Dict, Dict]:
    """Load a reference .pth checkpoint ({'model_sd': ...} or a bare
    state_dict) and convert it. Requires torch (CPU is fine)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_sd", ckpt) if isinstance(ckpt, dict) else ckpt
    return hved_params_from_torch(sd, cfg)
