"""Stub: imported by UxLSTMEnc_3d at module scope; only needed for the
nnU-Net plans factory path, which the parity tests never call."""


class ConfigurationManager:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError("stub")


class PlansManager:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError("stub")
