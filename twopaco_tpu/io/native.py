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
            lib.tp_encode_fasta_into.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(_TpFastaResult),
            ]
            lib.tp_encode_fasta_into.restype = ctypes.c_int
            lib.tp_free_result.argtypes = [ctypes.POINTER(_TpFastaResult)]
            lib.tp_emit_records.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.tp_emit_records.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def emit_records(
    chrs: np.ndarray,
    pos: np.ndarray,
    ids: np.ndarray,
    now_chr: int,
    scratch: np.ndarray | None = None,
) -> np.ndarray | None:
    """Assemble one chunk of 12-byte junction records (+ separators at
    chromosome increments) in one native pass; None if unavailable.
    chrs int64 / pos uint32 / ids int64, all C-contiguous, same length.
    `scratch` (uint8) is reused when big enough — callers in a write
    loop should pass the previous return's `.base` to avoid refaulting
    a fresh buffer per chunk.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(chrs)
    n_sep = max(int(chrs[-1]) - now_chr, 0)
    need = 12 * (n + n_sep)
    if scratch is None or scratch.size < need:
        from twopaco_tpu.hostmem import big_empty

        scratch = big_empty(need, np.uint8)
    written = lib.tp_emit_records(
        chrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        now_chr,
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return scratch[:written]


def encode_fasta_native(path: str) -> list[tuple[str, np.ndarray]] | None:
    """Parse + encode one FASTA natively; None if unavailable.

    Returns [(header, codes uint8)] like the numpy parser. Raises
    RuntimeError on invalid input (same conditions as the reference).
    """
    lib = _load()
    if lib is None:
        return None
    from twopaco_tpu.hostmem import big_empty

    # the encoder streams the file through a small chunk and writes
    # codes straight into this buffer — the ONLY multi-GB allocation of
    # the read path, and it comes from the shared-anon pool (fresh
    # private-anon pages fault at ~12-25 s/GB on this VM)
    try:
        cap = max(os.path.getsize(path), 1)
    except OSError:
        raise RuntimeError(f"Can't open file {os.fspath(path)}") from None
    codes = big_empty(cap, np.uint8)
    res = _TpFastaResult()
    rc = lib.tp_encode_fasta_into(
        os.fspath(path).encode(),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        ctypes.byref(res),
    )
    if rc != 0:
        msg = res.error.decode(errors="replace")
        raise RuntimeError(msg or f"native FASTA parse failed ({rc})")
    try:
        n = res.n_records
        total = res.codes_len
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
