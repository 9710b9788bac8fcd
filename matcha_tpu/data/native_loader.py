"""ctypes binding for the native C++ batch loader (libmatcha_native.so).

Build with ``make -C native``.  Falls back transparently to the numpy path
when the library isn't built — all public entry points mirror the Python
implementations in data/dataset.py and data/collate.py.
"""

from __future__ import annotations

import ctypes
from functools import lru_cache
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parent.parent.parent / "native" / "libmatcha_native.so",
]


@lru_cache(maxsize=1)
def load_library():
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.mtpu_mel_length.argtypes = [ctypes.c_char_p]
            lib.mtpu_mel_length.restype = ctypes.c_long
            lib.mtpu_fill_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.mtpu_fill_batch.restype = ctypes.c_int
            return lib
    return None


def available() -> bool:
    return load_library() is not None


def mel_length(path: str | Path) -> int:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    n = lib.mtpu_mel_length(str(path).encode())
    if n < 0:
        raise IOError(f"mtpu_mel_length({path}) failed: {n}")
    return int(n)


def fill_batch(
    paths: list[str | Path],
    t_pad: int,
    n_mels: int,
    threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Load B mel caches into a zero-padded (B, t_pad, n_mels) batch.

    Returns (batch, lengths).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    b = len(paths)
    out = np.empty((b, t_pad, n_mels), np.float32)
    lens = np.zeros((b,), np.int32)
    c_paths = (ctypes.c_char_p * b)(*[str(p).encode() for p in paths])
    rc = lib.mtpu_fill_batch(
        c_paths,
        b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_pad,
        n_mels,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        threads,
    )
    if rc != 0:
        raise IOError(f"mtpu_fill_batch failed with {rc}")
    return out, lens
