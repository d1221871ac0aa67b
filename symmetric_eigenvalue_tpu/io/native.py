"""ctypes loader for the native MTX parser (native/mtxio.c).

Compiles the shared library on first use with the system C compiler and caches
it next to the source (or in ~/.cache when the package dir is read-only).
Falls back silently — io/mtx.py keeps its pure-Python path — so the package
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "mtxio.c")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> str:
    d = os.path.dirname(_SRC)
    if os.access(d, os.W_OK):
        return os.path.join(d, "_mtxio.so")
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "symmetric_eigenvalue_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "_mtxio.so")


def _build(so: str) -> bool:
    cc = os.environ.get("CC", "cc")
    try:
        subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", so, _SRC],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SE_TPU_NO_NATIVE"):
        return None
    so = _so_path()
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(_SRC)):
        if not _build(so):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.mtx_read_symm_tridiag.restype = ctypes.c_long
    lib.mtx_read_symm_tridiag.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.mtx_write_symm_tridiag.restype = ctypes.c_long
    lib.mtx_write_symm_tridiag.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_char_p,
    ]
    lib.mtx_free.restype = None
    lib.mtx_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    _LIB = lib
    return _LIB


def read_symm_tridiag(path) -> Optional[Tuple[np.ndarray, np.ndarray, str]]:
    """Returns (d, e, "") on success, (None, None, errmsg) on parse error, or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dp = ctypes.POINTER(ctypes.c_double)()
    ep = ctypes.POINTER(ctypes.c_double)()
    errbuf = ctypes.create_string_buffer(512)
    n = lib.mtx_read_symm_tridiag(str(path).encode(), ctypes.byref(dp),
                                  ctypes.byref(ep), errbuf, 512)
    if n < 0:
        return None, None, errbuf.value.decode(errors="replace")
    d = np.ctypeslib.as_array(dp, shape=(n,)).copy()
    e = np.ctypeslib.as_array(ep, shape=(max(n - 1, 0),)).copy() \
        if n > 1 else np.zeros(0)
    lib.mtx_free(dp)
    lib.mtx_free(ep)
    return d, e, ""


def write_symm_tridiag(path, d, e, comment: str = "") -> bool:
    lib = get_lib()
    if lib is None:
        return False
    d = np.ascontiguousarray(d, dtype=np.float64)
    e = np.ascontiguousarray(e, dtype=np.float64)
    n = lib.mtx_write_symm_tridiag(
        str(path).encode(),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        d.shape[0], comment.encode())
    return n >= 0
