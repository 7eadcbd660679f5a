"""Model zoo registry (replaces /root/reference/classic_models/__init__.py,
whose dict references undefined classes and crashes on import — fixed here)."""
from __future__ import annotations

from xlstm_hved_tpu.config import MODEL_ALIASES, MODEL_ZOO, HVEDConfig, get_config
from xlstm_hved_tpu.models.hved import Discriminator, HVEDFusionNet, HVEDOutput
from xlstm_hved_tpu.models.uxlstm import (UXlstmBot, UXlstmEnc,
                                          build_uxlstm_from_plans)


def find_model_using_name(name: str, **overrides) -> HVEDFusionNet:
    """name -> constructed flax module (reference factory,
    classic_models/__init__.py:30-31)."""
    return HVEDFusionNet(cfg=get_config(name, **overrides))


def available_models():
    return sorted(set(MODEL_ZOO) | set(MODEL_ALIASES))


__all__ = [
    "Discriminator",
    "HVEDConfig",
    "HVEDFusionNet",
    "HVEDOutput",
    "UXlstmBot",
    "UXlstmEnc",
    "available_models",
    "build_uxlstm_from_plans",
    "find_model_using_name",
    "get_config",
]
