"""Minimal torchvision stand-in so the reference BraTSdataset.py imports on
this container (only `transforms.Normalize/CenterCrop` names are touched,
and only at import time — no parity test exercises them)."""
from . import transforms  # noqa: F401
