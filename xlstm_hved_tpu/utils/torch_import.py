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

Supported model families: the DoubleConv-based MVAE zoo (U_HVEDConvNet3D,
the DuSFE variants, and the ViL/skr flagship tail where noted). Fusion /
ExtResNetBlock variants raise NotImplementedError.
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


def _double_conv_folded(sd, prefix: str, key_fmt, streams: int) -> Dict:
    """Per-stream torch DoubleConv -> BlockDiagDoubleConv params."""
    return {
        "conv1": {"conv": _stacked_conv(
            sd, lambda m: f"{key_fmt(m, 'SingleConv1')}.conv", streams)},
        "conv2": {"conv": _stacked_conv(
            sd, lambda m: f"{key_fmt(m, 'SingleConv2')}.conv", streams)},
    }


def _double_conv_plain(sd, key: str) -> Dict:
    """torch DoubleConv -> my DoubleConv (SingleConv children conv1/conv2,
    each one auto-named Conv3DFast_0)."""
    return {
        "conv1": {"Conv3DFast_0": _conv(sd, f"{key}.SingleConv1.conv")},
        "conv2": {"Conv3DFast_0": _conv(sd, f"{key}.SingleConv2.conv")},
    }


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
    if cfg.basic_module != "double_conv":
        raise NotImplementedError(
            "torch import supports the DoubleConv-based MVAE family; got "
            f"basic_module={cfg.basic_module!r}")
    if not cfg.mvae or not cfg.mvae_reduction:
        raise NotImplementedError(
            "torch import currently requires the MVAE+reduction zoo config")
    if cfg.fusion_level < cfg.num_levels:
        raise NotImplementedError("single-stream deep levels not mapped yet")

    M = cfg.multi_stream
    L = cfg.num_levels
    n_dec = L - 1
    p: Dict = {}
    stats: Dict = {}

    p["init_blocks"] = _stacked_conv(sd, lambda m: f"init_blocks.{m}.0", M)

    for i in range(L):
        blocks = {}
        for b in range(cfg.num_block[i]):
            blocks[f"block{b}"] = _double_conv_folded(
                sd, f"encoders_{i}",
                lambda m, sc, i=i, b=b: f"encoders.{i}.{m}.basic_module.{b}.{sc}",
                M)
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
            basic = _double_conv_plain(sd, f"decoders.{j}.basic_module")
        p[f"sdecoder_{j}"] = {
            "atten": _atten2(sd, f"decoders.{j}.atten_module"),
            "basic": basic}

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
                p[f"rdecoder_{m}_{j}"] = {"basic": _double_conv_plain(
                    sd, f"rdecoder.multi_decoders.{m}.{j}.basic_module")}
            p[f"rfinal_{m}"] = _conv(sd, f"rdecoder.finals.{m}")

    if cfg.mid_vil:
        p["mvil"] = _vil3d(sd, "mViL")
    if cfg.skip_return:
        raise NotImplementedError(
            "skip-return (skr gate/encoder) import not mapped yet")
    return p, stats


def load_reference_checkpoint(path: str, cfg: HVEDConfig) -> Tuple[Dict, Dict]:
    """Load a reference .pth checkpoint ({'model_sd': ...} or a bare
    state_dict) and convert it. Requires torch (CPU is fine)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_sd", ckpt) if isinstance(ckpt, dict) else ckpt
    return hved_params_from_torch(sd, cfg)
