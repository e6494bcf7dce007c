"""ctypes bindings for the native C++ FASTA/FASTQ reader (native/fastx.cpp).

Builds the shared library on first use (g++ -O2, links zlib) and caches it
next to the source; falls back silently to the pure-Python reader when the
toolchain or zlib headers are unavailable. Disable with
METAMAPS_TPU_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


class _FastxData(ctypes.Structure):
    _fields_ = [
        ("seq", ctypes.POINTER(ctypes.c_uint8)),
        ("seq_off", ctypes.POINTER(ctypes.c_int64)),
        ("names", ctypes.c_char_p),
        ("name_off", ctypes.POINTER(ctypes.c_int64)),
        ("n", ctypes.c_int64),
    ]


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("METAMAPS_TPU_NATIVE", "1") == "0":
        return None
    src = os.path.join(os.path.dirname(__file__), "..", "..", "native", "fastx.cpp")
    src = os.path.abspath(src)
    if not os.path.exists(src):
        return None
    so = os.path.join(os.path.dirname(src), "libfastx.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so, src, "-lz"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.fastx_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(_FastxData)]
        lib.fastx_read.restype = ctypes.c_int
        lib.fastx_free.argtypes = [ctypes.POINTER(_FastxData)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def read_sequences_native(path: str) -> Optional[Iterator[Tuple[str, np.ndarray]]]:
    """Parse the whole file natively; returns None when unavailable so the
    caller can fall back to the Python reader."""
    lib = _build_and_load()
    if lib is None:
        return None
    data = _FastxData()
    rc = lib.fastx_read(path.encode(), ctypes.byref(data))
    if rc != 0:
        if rc != 1:
            lib.fastx_free(ctypes.byref(data))
        raise RuntimeError(f"native fastx parse failed (code {rc}) for {path}")
    try:
        n = data.n
        seq_off = np.ctypeslib.as_array(data.seq_off, shape=(n + 1,)).copy()
        total = int(seq_off[-1])
        seq = np.ctypeslib.as_array(data.seq, shape=(max(total, 1),))[:total].copy()
        name_off = np.ctypeslib.as_array(data.name_off, shape=(n + 1,)).copy()
        names_blob = ctypes.string_at(data.names, int(name_off[-1]))
    finally:
        lib.fastx_free(ctypes.byref(data))

    def gen():
        for i in range(n):
            name = names_blob[name_off[i] : name_off[i + 1]].decode()
            yield name, seq[seq_off[i] : seq_off[i + 1]]

    return gen()
