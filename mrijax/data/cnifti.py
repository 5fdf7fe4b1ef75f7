"""ctypes binding to the native IO runtime (csrc/mrijax_io.cpp).

The fast path for training ingest: gunzip + header parse + float32 cast in
C++, and batch decode on a thread pool that runs outside the GIL —
replacing the role of torch DataLoader worker *processes* without IPC.

Falls back transparently: ``available()`` is False when the shared library
hasn't been built (``make -C csrc``), and callers (datasets, the packing
CLI) use the pure-numpy reader in ``mrijax.data.nifti`` instead. Both
implementations produce bit-identical float32 output (tested).
"""

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "libmrijax_io.so"
_lib = None

_ERRORS = {
    -1: "cannot open file",
    -2: "gzip decode failed",
    -3: "bad NIfTI header",
    -4: "unsupported NIfTI datatype",
    -5: "size mismatch",
}


class _NiftiInfo(ctypes.Structure):
    _fields_ = [
        ("ndim", ctypes.c_int32),
        ("shape", ctypes.c_int64 * 7),
        ("datatype", ctypes.c_int32),
        ("bitpix", ctypes.c_int32),
        ("scl_slope", ctypes.c_double),
        ("scl_inter", ctypes.c_double),
        ("vox_offset", ctypes.c_int64),
        ("little_endian", ctypes.c_int32),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.nifti_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(_NiftiInfo)]
    lib.nifti_probe.restype = ctypes.c_int
    lib.nifti_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    lib.nifti_decode.restype = ctypes.c_int
    lib.nifti_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.nifti_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _raise(rc: int, path) -> None:
    raise IOError(f"native NIfTI decode failed for {path}: "
                  f"{_ERRORS.get(rc, f'code {rc}')}")


def probe(path) -> Tuple[Tuple[int, ...], dict]:
    """(shape, header dict) without decoding voxels."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmrijax_io.so not built (make -C csrc)")
    info = _NiftiInfo()
    rc = lib.nifti_probe(str(path).encode(), ctypes.byref(info))
    if rc != 0:
        _raise(rc, path)
    shape = tuple(int(info.shape[i]) for i in range(info.ndim))
    return shape, {
        "datatype": info.datatype,
        "bitpix": info.bitpix,
        "scl_slope": info.scl_slope,
        "scl_inter": info.scl_inter,
        "vox_offset": info.vox_offset,
        "little_endian": bool(info.little_endian),
    }


def load(path) -> np.ndarray:
    """Decode one volume to float32 in the on-disk (Fortran) axis order —
    same output as ``mrijax.data.nifti.load``."""
    shape, _ = probe(path)
    n = int(np.prod(shape))
    out = np.empty((n,), np.float32)
    lib = _load()
    rc = lib.nifti_decode(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    if rc != 0:
        _raise(rc, path)
    return out.reshape(shape, order="F")


def load_batch(paths: Sequence, num_threads: Optional[int] = None) -> List[np.ndarray]:
    """Decode many volumes concurrently (C++ thread pool, GIL released)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmrijax_io.so not built (make -C csrc)")
    num_threads = num_threads or min(8, os.cpu_count() or 1)
    shapes = [probe(p)[0] for p in paths]
    outs = [np.empty((int(np.prod(s)),), np.float32) for s in shapes]

    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs]
    )
    c_elems = (ctypes.c_int64 * n)(*[o.size for o in outs])
    c_rcs = (ctypes.c_int32 * n)()
    rc = lib.nifti_decode_batch(c_paths, c_outs, c_elems, n, num_threads, c_rcs)
    if rc != 0:
        bad = next(i for i in range(n) if c_rcs[i] != 0)
        _raise(c_rcs[bad], paths[bad])
    return [o.reshape(s, order="F") for o, s in zip(outs, shapes)]
