"""Import-time stand-in for nibabel (not installed; this repo has its own
NIfTI IO). Only BraTSdataset.py's module-level `import nibabel as nib`
needs to succeed — no parity test touches the nib-using loaders."""


def load(*a, **k):
    raise NotImplementedError("nibabel stub: reference NIfTI loaders are "
                              "not exercised by the parity tests")
