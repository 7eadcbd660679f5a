"""Model zoo registry (replaces /root/reference/classic_models/__init__.py,
whose dict references undefined classes and crashes on import — fixed here)."""
from __future__ import annotations

from xlstm_hved_tpu.config import MODEL_ALIASES, MODEL_ZOO, HVEDConfig, get_config
from xlstm_hved_tpu.models.hemis import UHeMIS
from xlstm_hved_tpu.models.hved import Discriminator, HVEDFusionNet, HVEDOutput
from xlstm_hved_tpu.models.uxlstm import (UXlstmBot, UXlstmEnc,
                                          build_uxlstm_from_plans)


def find_model_using_name(name: str, **overrides):
    """name -> constructed flax module (reference factory,
    classic_models/__init__.py:30-31). Covers every name the reference
    registry exposes, plus the U_HeMIS baseline (/root/reference/U_Hemis.py,
    which the reference implements but never registers)."""
    if MODEL_ALIASES.get(name, name) == "U_HeMIS":
        kw = {}
        if "compute_dtype" in overrides:
            import jax.numpy as jnp

            kw["dtype"] = jnp.dtype(overrides.pop("compute_dtype"))
        overrides.pop("remat", None)  # HVED-only flag
        kw.update(overrides)
        return UHeMIS(**kw)
    return HVEDFusionNet(cfg=get_config(name, **overrides))


def available_models():
    return sorted(set(MODEL_ZOO) | set(MODEL_ALIASES) | {"U_HeMIS"})


__all__ = [
    "Discriminator",
    "UHeMIS",
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
