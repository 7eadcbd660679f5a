"""Configuration tree and model-zoo presets.

Replaces the reference's constructor-kwarg zoo (/root/reference/RA_HVED.py:689-1139)
and registry dict (/root/reference/classic_models/__init__.py:2-31) with one
dataclass + preset table. The reference registry registers several names whose
classes don't exist (XLSTM_HVED_drop_vil, RA_HVED, XLSTM_HVED_woME_VAEback*),
which makes `import classic_models` raise NameError — here every registered
name resolves (SURVEY.md §4 defect 1, fixed).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def features_per_level(init: int, num_levels: int) -> Tuple[int, ...]:
    """[f, 2f, 4f, ...] (reference number_of_features_per_level,
    /root/reference/utils.py:494-495)."""
    return tuple(init * (2 ** k) for k in range(num_levels))


@dataclasses.dataclass(frozen=True)
class HVEDConfig:
    """Architecture flags of AbstractFusion3DUNet
    (/root/reference/RA_HVED.py:266-307) plus compute policy."""

    in_channels: int = 1          # per modality stream
    out_channels: int = 3         # WT / TC / ET sigmoid channels
    f_maps: int = 4
    layer_order: str = "ilc"
    num_levels: int = 4
    num_block: Tuple[int, ...] = (1, 1, 1, 1)
    multi_stream: int = 4
    fusion_level: int = 4
    basic_module: str = "double_conv"   # double_conv | ext_resnet
    final_sigmoid: bool = True
    num_groups: int = 8

    # MVAE latent stage
    mvae: bool = True
    mvae_reduction: bool = True

    # decoders / aux paths
    recon_decoder: bool = True
    seg_recon_decoder: bool = True
    recon_skip: bool = True
    shared_recon: bool = True
    skip_return: bool = False
    mid_vil: bool = False
    vil_decoder: bool = False           # ViL= flag: DoubleConv_ViL in decoder i<1
    fusion: bool = False                # non-MVAE FusionModule path

    # compute policy
    compute_dtype: str = "float32"      # 'bfloat16' on TPU for speed
    vil_chunk_size: int = 128
    # None = auto: fused Pallas kernel on TPU, XLA chunkwise scan elsewhere.
    # On TPU the kernel is both faster and closer to the fp64 oracle (see
    # ops/mlstm.py docstring on matmul precision).
    use_pallas_mlstm: Optional[bool] = None
    remat: bool = False                 # rematerialize encoder/decoder stages
    # in backward (jax.checkpoint per stage): enables training the reference
    # crop (128x192x128, batch 1) within one chip's 16 GB HBM

    # ---- derived ----
    @property
    def enc_f_maps(self) -> Tuple[int, ...]:
        return features_per_level(self.f_maps, self.num_levels)

    @property
    def dec_f_maps(self) -> Tuple[int, ...]:
        if self.mvae:
            if self.mvae_reduction:
                return features_per_level(self.f_maps, self.num_levels)
            if self.basic_module == "double_conv":
                return features_per_level(self.f_maps, self.num_levels)
            return features_per_level(self.f_maps // 2, self.num_levels)
        return features_per_level(self.f_maps * self.multi_stream, self.num_levels)

    @property
    def mvae_latents(self) -> Tuple[int, ...]:
        base = self.f_maps // 4 if self.mvae_reduction else self.f_maps // 2
        return features_per_level(max(base, 1), self.num_levels)

    @property
    def rec_f_maps(self) -> int:
        return self.dec_f_maps[0] if self.mvae else self.dec_f_maps[0] // 2


# Flagship construction kwargs used by every entry point
# (/root/reference/train.py:142-143): f_maps=4, layer_order='ilc',
# multi_stream=4, fusion_level=4, shared_recon=True, recon_skip=True,
# MVAE_reduction=True, final_sigmoid=True.
_BASE = dict(
    f_maps=4, layer_order="ilc", multi_stream=4, fusion_level=4,
    shared_recon=True, recon_skip=True, mvae_reduction=True, final_sigmoid=True,
)


def _cfg(**kw) -> HVEDConfig:
    merged = dict(_BASE)
    merged.update(kw)
    return HVEDConfig(**merged)


# Model zoo: every concrete class of /root/reference/RA_HVED.py:689-1139 (the
# duplicate XLSTM_HVED_woViL definition collapses to one entry) plus the
# registry aliases from /root/reference/classic_models/__init__.py.
MODEL_ZOO = {
    # basic conv HVED without MVAE (fusion module path); the as-shipped class
    # crashes without fusion=True — fixed here (SURVEY.md §4).
    "FusionUNet3D": _cfg(mvae=False, fusion=True, basic_module="double_conv",
                         seg_recon_decoder=False, mvae_reduction=False),
    # residual-Unet U-HVED
    "U_HVEDNet3D": _cfg(mvae=True, basic_module="ext_resnet",
                        seg_recon_decoder=False),
    # original U-HVED (conv)
    "U_HVEDConvNet3D": _cfg(mvae=True, seg_recon_decoder=False),
    # + ViL decoder blocks
    "U_HVEDConvXLSTMNet3D": _cfg(mvae=True, seg_recon_decoder=False,
                                 vil_decoder=True),
    # + DuSFE coupled seg/recon decoder
    "U_HVEDConvDuSFENet3D": _cfg(mvae=True, seg_recon_decoder=True),
    # + skip-return
    "U_HVEDConvDuSFESkrNet3D": _cfg(mvae=True, seg_recon_decoder=True,
                                    skip_return=True),
    # + mid-ViL (no skr)
    "U_HVEDConvDuSFEmViLNet3D": _cfg(mvae=True, seg_recon_decoder=True,
                                     mid_vil=True),
    # + mid-ViL + skr
    "U_HVEDConvDuSFEmViLSkrNet3D": _cfg(mvae=True, seg_recon_decoder=True,
                                        skip_return=True, mid_vil=True),
    # flagship: DuSFE + Skr + mid-ViL (RA_HVED.py:945-958)
    "XLSTM_HVED": _cfg(mvae=True, seg_recon_decoder=True, skip_return=True,
                       mid_vil=True),
    # ablations (RA_HVED.py:983-1139)
    "XLSTM_HVED_woSMVAE": _cfg(mvae=True, seg_recon_decoder=True,
                               skip_return=False, mid_vil=True),
    "XLSTM_HVED_woViL": _cfg(mvae=True, seg_recon_decoder=True,
                             skip_return=True, mid_vil=False),
    "XLSTM_HVED_woDuSFE": _cfg(mvae=True, seg_recon_decoder=False,
                               skip_return=True, mid_vil=True),
}

# Every name in the reference registry (/root/reference/classic_models/
# __init__.py:2-28) must resolve here. Aliases mapped to an existing class by
# the reference itself keep that mapping; names the reference points at
# NONEXISTENT classes (import-time NameError there) map to the closest
# existing config by name semantics.
MODEL_ALIASES = {
    # aliases the reference maps to real classes (same mapping kept)
    "U_HVEDConvDuSFEmViLNet3D_pretrain": "U_HVEDConvDuSFEmViLNet3D",
    "U_HVEDDuSFEmViLDFNet3D": "U_HVEDConvDuSFEmViLSkrNet3D",
    "XLSTM_HVED_missing1": "XLSTM_HVED",
    # names the reference registers but never defines (SURVEY.md §4 defect 1)
    "RA_HVED": "XLSTM_HVED",
    "XLSTM_HVED_drop_vil": "XLSTM_HVED_woViL",
    "XLSTM_HVED_woME_VAEback": "XLSTM_HVED",
    "XLSTM_HVED_woME_VAEback_woViL": "XLSTM_HVED_woViL",
    "XLSTM_HVED_woME_VAEback_CK": "XLSTM_HVED",
    "XLSTM_HVED_woME_VAEback_ViLAtt": "XLSTM_HVED",
    "XLSTM_HVED_woME_VAEback_ViLAtt_woskip_vil_m1": "XLSTM_HVED",
    "XLSTM_HVED_woME_VAEback_ViLAtt_DC": "XLSTM_HVED",
    "XLSTM_HVED_woME_VAEback_ViLAtt_DC_noPretrain": "XLSTM_HVED",
}


def get_config(name: str, **overrides) -> HVEDConfig:
    name = MODEL_ALIASES.get(name, name)
    if name not in MODEL_ZOO:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_ZOO)}")
    cfg = MODEL_ZOO[name]
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (/root/reference/train.py:34-65,164-189)."""

    num_epochs: int = 3000
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    weight_adv: float = 0.1     # alpha
    weight_vae: float = 0.2     # beta
    use_sdm: bool = False       # add boundary loss <seg, SDM(gt)>
    weight_bd: float = 0.5      # boundary-loss weight (reference leaves the
    # SDM path unwired, loss.py:136-146/utils.py:217-257; weight chosen here)
    poly_power: float = 0.9
    crop_size: Tuple[int, int, int] = (128, 192, 128)
    train_batch: int = 1
    valid_batch: int = 1
    seed: int = 1
    validate_every: int = 1
    backup_interval: int = 5
    disc_f_maps: int = 64
    disc_kernel: int = 4
    steps_per_epoch: Optional[int] = None
