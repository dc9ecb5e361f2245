"""Binary junction-position list: reference-identical 12-byte records.

Format (reference junctionapi.h:107-137): a flat stream of little-endian
records ``uint32 pos`` + ``int64 id``. Chromosome ids are implicit: a
separator record (pos=0xFFFFFFFF, id=INT64_MAX) is written once per
chromosome increment; the reader infers the chromosome by counting
separators. The writer auto-inserts separators exactly like the
reference's JunctionPositionWriter (junctionapi.h:118-132).
"""

from __future__ import annotations

import numpy as np

from twopaco_tpu.io import native as _native

SEPARATOR_POS = np.uint32(0xFFFFFFFF)
SEPARATOR_ID = np.int64((1 << 63) - 1)

RECORD_DTYPE = np.dtype([("pos", "<u4"), ("id", "<i8")], align=False)
assert RECORD_DTYPE.itemsize == 12


class JunctionWriter:
    """Streaming writer; accepts per-chromosome arrays or single records."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._now_chr = 0

    def _advance_chr(self, chr_id: int) -> None:
        n_sep = chr_id - self._now_chr
        if n_sep > 0:
            sep = np.empty(n_sep, dtype=RECORD_DTYPE)
            sep["pos"] = SEPARATOR_POS
            sep["id"] = SEPARATOR_ID
            sep.tofile(self._f)
            self._now_chr = chr_id

    def write_array(self, chr_id: int, pos: np.ndarray, ids: np.ndarray) -> None:
        """Write a run of records for one chromosome, in the given order."""
        self._advance_chr(chr_id)
        rec = np.empty(len(pos), dtype=RECORD_DTYPE)
        rec["pos"] = pos.astype(np.uint32, copy=False)
        rec["id"] = ids.astype(np.int64, copy=False)
        rec.tofile(self._f)

    def write(self, chr_id: int, pos: int, junction_id: int) -> None:
        self.write_array(
            chr_id,
            np.asarray([pos], dtype=np.uint32),
            np.asarray([junction_id], dtype=np.int64),
        )

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ChunkWriter:
    """Vectorized streaming writer for (chr, pos, id) chunks in stream
    order: separator records are spliced at chromosome increments
    (including skipped chromosomes), with the chromosome counter carried
    across chunks — byte-identical to write_records_with_separators on
    the concatenated input, at bounded memory."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._now_chr = 0
        self._scratch = None  # reused native assembly buffer
        sep = np.empty(1, dtype=RECORD_DTYPE)
        sep["pos"] = SEPARATOR_POS
        sep["id"] = SEPARATOR_ID
        self._sep = sep.tobytes()

    def write(self, chrs: np.ndarray, pos: np.ndarray, ids: np.ndarray):
        n = len(chrs)
        if n == 0:
            return
        chrs = np.ascontiguousarray(chrs, np.int64)
        buf = _native.emit_records(
            chrs,
            np.ascontiguousarray(pos, np.uint32),
            np.ascontiguousarray(ids, np.int64),
            self._now_chr,
            scratch=self._scratch,
        )
        if buf is not None:
            self._scratch = buf.base if buf.base is not None else buf
            self._f.write(buf.data)
            self._now_chr = int(chrs[-1])
            return
        scratch = np.empty((n, 3), np.uint32)
        scratch[:, 0] = pos
        scratch[:, 1:] = (
            np.ascontiguousarray(ids, np.int64).view(np.uint32).reshape(n, 2)
        )
        rec = scratch.reshape(-1).view(np.uint8).reshape(n, 12)
        prev = np.empty(n, np.int64)
        prev[0] = self._now_chr
        prev[1:] = chrs[:-1]
        first = np.flatnonzero(chrs != prev)
        start = 0
        # rec slices are C-contiguous: write the buffer directly (a
        # .tobytes() copy doubled the write path's memory traffic)
        for i in first:
            self._f.write(rec[start:i].data)
            self._f.write(self._sep * int(chrs[i] - prev[i]))
            start = int(i)
        self._f.write(rec[start:].data)
        self._now_chr = int(chrs[-1])

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_records_with_separators(
    path: str, chrs: np.ndarray, pos: np.ndarray, ids: np.ndarray
) -> None:
    """Write a whole run's records in one vectorized shot.

    chrs must be nondecreasing; a separator record is materialized per
    chromosome increment (including skipped chromosomes), exactly like
    the incremental JunctionWriter / the reference's writer
    (junctionapi.h:118-132).
    """
    chrs = np.asarray(chrs, np.int64)
    n = len(chrs)
    # contiguous record image via an aligned scratch (u4, i4, i4 lanes):
    # ~6x faster than scattering into a strided 12-byte structured array
    scratch = np.empty((n, 3), np.uint32)
    scratch[:, 0] = pos
    lanes = (
        np.ascontiguousarray(ids, np.int64).view(np.uint32).reshape(n, 2)
    )
    scratch[:, 1:] = lanes  # little-endian int64 halves
    rec = scratch.reshape(-1).view(np.uint8).reshape(n, 12)

    prev = np.empty(n, np.int64)
    if n:
        prev[0] = 0
        prev[1:] = chrs[:-1]
    first = np.flatnonzero(chrs != prev)  # records preceded by separators
    sep = np.empty(1, dtype=RECORD_DTYPE)
    sep["pos"] = SEPARATOR_POS
    sep["id"] = SEPARATOR_ID
    sep_bytes = sep.tobytes()
    with open(path, "wb") as f:
        start = 0
        for i in first:
            f.write(rec[start:i].tobytes())
            f.write(sep_bytes * int(chrs[i] - prev[i]))
            start = int(i)
        f.write(rec[start:].tobytes())


def read_junctions(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read the whole file -> (chr int32, pos uint32, id int64) arrays.

    Mirrors JunctionPositionReader::NextJunctionPosition
    (junctionapi.h:81-99): separators bump the chromosome counter and are
    not returned.
    """
    import os

    size = os.path.getsize(path)
    if size % RECORD_DTYPE.itemsize != 0:
        raise RuntimeError(
            f"{path}: size {size} is not a multiple of the 12-byte "
            "junction record — truncated or not a twopaco binary"
        )
    rec = np.fromfile(path, dtype=RECORD_DTYPE)
    is_sep = (rec["pos"] == SEPARATOR_POS) & (rec["id"] == SEPARATOR_ID)
    chrs = np.cumsum(is_sep.astype(np.int32)) - is_sep.astype(np.int32)
    keep = ~is_sep
    return chrs[keep].astype(np.int32), rec["pos"][keep], rec["id"][keep]
