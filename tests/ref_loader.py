"""Import the reference PyTorch implementation (/root/reference) on CPU-only
torch, for cross-implementation parity tests.

The reference assumes CUDA (`.cuda()` sprinkled through forward paths,
RA_HVED.py:520) and two pip packages that are not installed
(dynamic_network_architectures, the nnunetv2 utilities); tests/ref_stubs
provides minimal namespace-merged stand-ins and this loader neutralizes the
CUDA calls so the graphs run on CPU.
"""
from __future__ import annotations

import os
import sys

_REF = "/root/reference"
_STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_stubs")


def load_reference():
    """Returns the imported RA_HVED module (cached after first call)."""
    import torch

    for p in (_STUBS, _REF, os.path.join(_REF, "UxLSTM")):
        if p not in sys.path:
            sys.path.append(p)
    # CPU-only torch: make .cuda() a no-op so reference forwards run
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import RA_HVED  # noqa: E402

    return RA_HVED


def load_reference_dataset():
    """Returns the imported reference BraTSdataset module (needs the
    torchvision stub in ref_stubs; everything else it imports is real)."""
    load_reference()  # sys.path + cuda neutralization
    import BraTSdataset  # noqa: E402

    return BraTSdataset
