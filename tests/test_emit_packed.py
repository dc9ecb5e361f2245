"""emit_junctions_packed must be byte-identical to emit_junctions on
the same occurrence stream (random streams incl. stubs, multi-chr)."""

import numpy as np
import pytest
from types import SimpleNamespace

from twopaco_tpu.passes.pipeline import emit_junctions, emit_junctions_packed

P = 64


def _batches(n_seqs, rows_per_seq):
    n_rows = n_seqs * rows_per_seq
    seq_id = np.repeat(np.arange(n_seqs), rows_per_seq).astype(np.int64)
    pos0 = (
        np.tile(np.arange(rows_per_seq, dtype=np.int64), n_seqs) * P + 1
    )
    valid = np.full(n_rows, P, np.int64)
    n_pos = np.full(n_rows, rows_per_seq * P, np.int64)
    return [SimpleNamespace(seq_id=seq_id, pos0=pos0, valid=valid, n_pos=n_pos)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_emit_matches_unpacked(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n_seqs, rows_per_seq = 5, 8
    batches = _batches(n_seqs, rows_per_seq)
    n_slots = n_seqs * rows_per_seq * P
    table_len = 1000

    n = 300
    flat = np.sort(
        rng.choice(n_slots, size=n, replace=False).astype(np.int64)
    )
    ids = rng.integers(1, table_len + 1, size=n).astype(np.int64)
    ids *= rng.choice(np.array([-1, 1], np.int64), size=n)

    out_a = str(tmp_path / "a.dbg")
    occ_a, st_a = emit_junctions(out_a, batches, flat, ids, table_len, P)

    keys = (flat.astype(np.uint64) << np.uint64(32)) | (
        ids + (np.int64(1) << 31)
    ).astype(np.uint64)
    out_b = str(tmp_path / "b.dbg")
    occ_b, st_b = emit_junctions_packed(
        out_b, batches, keys, table_len, P
    )

    assert (occ_a, st_a) == (occ_b, st_b)
    with open(out_a, "rb") as fa, open(out_b, "rb") as fb:
        assert fa.read() == fb.read()
