"""ctypes bridge to the native C++ FASTA encoder (native/fastaio.cpp).

Builds the shared library on first use (make, cached under
native/build/); every consumer falls back to the numpy parser when the
toolchain or library is unavailable, so the native path is a pure
accelerator, never a requirement. Disable with TWOPACO_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libtwopaco_io.so")

_lock = threading.Lock()
_lib = None
_lib_tried = False


class _TpFastaResult(ctypes.Structure):
    _fields_ = [
        ("codes", ctypes.POINTER(ctypes.c_uint8)),
        ("codes_len", ctypes.c_int64),
        ("rec_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("n_records", ctypes.c_int64),
        ("headers", ctypes.POINTER(ctypes.c_char)),
        ("headers_len", ctypes.c_int64),
        ("error", ctypes.c_char * 256),
    ]


def _load():
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if os.environ.get("TWOPACO_NATIVE", "1") == "0":
            return None
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.tp_encode_fasta.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(_TpFastaResult),
            ]
            lib.tp_encode_fasta.restype = ctypes.c_int
            lib.tp_free_result.argtypes = [ctypes.POINTER(_TpFastaResult)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def encode_fasta_native(path: str) -> list[tuple[str, np.ndarray]] | None:
    """Parse + encode one FASTA natively; None if unavailable.

    Returns [(header, codes uint8)] like the numpy parser. Raises
    RuntimeError on invalid input (same conditions as the reference).
    """
    lib = _load()
    if lib is None:
        return None
    res = _TpFastaResult()
    rc = lib.tp_encode_fasta(os.fspath(path).encode(), ctypes.byref(res))
    if rc != 0:
        msg = res.error.decode(errors="replace")
        raise RuntimeError(msg or f"native FASTA parse failed ({rc})")
    try:
        n = res.n_records
        total = res.codes_len
        codes = np.ctypeslib.as_array(res.codes, shape=(max(total, 1),))[
            :total
        ].copy()
        offs = np.ctypeslib.as_array(res.rec_offsets, shape=(n + 1,)).copy()
        raw_headers = ctypes.string_at(res.headers, res.headers_len)
        headers = raw_headers.split(b"\0")[:n]
        out = []
        for i in range(n):
            out.append(
                (
                    headers[i].decode("latin-1"),
                    codes[offs[i] : offs[i + 1]],
                )
            )
        return out
    finally:
        lib.tp_free_result(ctypes.byref(res))
