"""Native runtime bindings (ctypes).

`native_read_nifti` / `native_read_subject` use the C++ loader
(nifti_loader.cc) when libnifti_loader.so has been built (make -C this dir);
they raise NativeUnavailable otherwise, and data/nifti.py remains the pure
Python fallback. Build is attempted lazily once per process.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libnifti_loader.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


class NativeUnavailable(RuntimeError):
    pass


def _ensure_lib(build: bool = True) -> ctypes.CDLL:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build and not _tried:
        _tried = True
        try:
            subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            raise NativeUnavailable(f"native loader build failed: {e}") from e
    if not os.path.exists(_LIB_PATH):
        raise NativeUnavailable("libnifti_loader.so not built")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nifti_probe.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int64)]
    lib.nifti_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.nifti_read_subject_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _ensure_lib()
        return True
    except NativeUnavailable:
        return False


def _shape_from(arr) -> Tuple[int, ...]:
    ndim = int(arr[0])
    return tuple(int(arr[i + 1]) for i in range(ndim))


def native_read_nifti(path: str) -> np.ndarray:
    """Decode one NIfTI file to fp32 (Fortran voxel order, like the python
    reader)."""
    lib = _ensure_lib()
    shape_out = (ctypes.c_int64 * 8)()
    rc = lib.nifti_probe(path.encode(), shape_out)
    if rc != 0:
        raise IOError(f"nifti_probe({path}) failed rc={rc}")
    shape = _shape_from(shape_out)
    out = np.empty(int(np.prod(shape)), np.float32)
    rc = lib.nifti_read_f32(path.encode(),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            out.size, shape_out)
    if rc != 0:
        raise IOError(f"nifti_read_f32({path}) failed rc={rc}")
    return out.reshape(shape, order="F")


def native_read_subject(data_dir: str, subject: str,
                        suffixes=("t1c", "t1n", "t2f", "t2w")) -> np.ndarray:
    """Decode all modalities of a subject concurrently -> (M, ...) fp32."""
    lib = _ensure_lib()
    shape_out = (ctypes.c_int64 * 8)()
    csv = ",".join(suffixes).encode()
    first = os.path.join(data_dir, subject, f"{subject}-{suffixes[0]}.nii.gz")
    if not os.path.exists(first):
        first = first[:-3]
    rc = lib.nifti_probe(first.encode(), shape_out)
    if rc != 0:
        raise IOError(f"nifti_probe({first}) failed rc={rc}")
    vol_shape = _shape_from(shape_out)
    count = int(np.prod(vol_shape))
    out = np.empty(len(suffixes) * count, np.float32)
    rc = lib.nifti_read_subject_f32(
        data_dir.encode(), subject.encode(), csv,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        shape_out)
    if rc != 0:
        raise IOError(f"nifti_read_subject_f32({subject}) failed rc={rc}")
    # each modality buffer is one Fortran-ordered volume
    vols = [out[m * count:(m + 1) * count].reshape(vol_shape, order="F")
            for m in range(len(suffixes))]
    return np.stack(vols, axis=0)
