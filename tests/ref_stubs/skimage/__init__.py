"""Stub skimage (not installed): only `segmentation.find_boundaries` is
referenced by the reference utils.py (compute_sdm path, which the parity
tests never call)."""
