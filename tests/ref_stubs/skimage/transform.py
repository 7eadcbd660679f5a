"""Stub: transform.py imports `rescale` at module level but the parity
tests never exercise the skimage path (reference Scale uses scipy zoom)."""


def rescale(*a, **k):
    raise NotImplementedError("skimage stub")
