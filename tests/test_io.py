"""FASTA parsing, junction binary format, window batcher."""

import numpy as np
import pytest

from twopaco_tpu import dna
from twopaco_tpu.io import fasta, junctions, windows


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = dna.encode(s)
    np.testing.assert_array_equal(codes, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    assert dna.decode(codes) == "ACGTNACGTN"


def test_encode_ambiguity_and_invalid():
    assert (dna.encode("URYKMSWBDHXV") == 4).all()
    with pytest.raises(ValueError):
        dna.encode("ACGZ")


def test_revcomp_str():
    assert dna.revcomp_str("ACGTN") == "NACGT"


def test_read_fasta(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">seq1 extra stuff\nACGT\nacgtn\n>seq2\n\nTT gg\n")
    recs = list(fasta.read_fasta(p))
    assert [h for h, _ in recs] == ["seq1", "seq2"]
    assert dna.decode(recs[0][1]) == "ACGTACGTN"
    assert dna.decode(recs[1][1]) == "TTGG"


def test_read_fasta_rejects_invalid(tmp_path):
    p = tmp_path / "bad.fa"
    p.write_text(">s\nACGZ\n")
    with pytest.raises(fasta.FastaError):
        list(fasta.read_fasta(p))


def test_read_sequences_text_preserves_ambiguity(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">s\nACgtYw\n")
    assert list(fasta.read_sequences_text([p])) == ["ACGTYW"]


def test_junction_roundtrip(tmp_path):
    p = str(tmp_path / "j.bin")
    with junctions.JunctionWriter(p) as w:
        w.write(0, 0, 7)
        w.write(0, 129, 1)
        w.write(2, 5, -3)  # skips chr 1 -> two separators
    # file layout: 2 records, 2 separators, 1 record
    assert (tmp_path / "j.bin").stat().st_size == 12 * 5
    c, pos, ids = junctions.read_junctions(p)
    np.testing.assert_array_equal(c, [0, 0, 2])
    np.testing.assert_array_equal(pos, [0, 129, 5])
    np.testing.assert_array_equal(ids, [7, 1, -3])


def test_reference_example_dbg_parses():
    import os
    from tests.conftest import GOLDEN_DIR

    c, pos, ids = junctions.read_junctions(
        os.path.join(GOLDEN_DIR, "example_k11.dbg")
    )
    assert len(pos) == 16  # 16 junction occurrences (BASELINE.md)
    # matches the committed example.seq golden
    with open(os.path.join(GOLDEN_DIR, "example_k11.seq")) as fh:
        lines = [tuple(map(int, l.split())) for l in fh if l.strip()]
    np.testing.assert_array_equal(c, [l[0] for l in lines])
    np.testing.assert_array_equal(pos, [l[1] for l in lines])
    np.testing.assert_array_equal(ids, [l[2] for l in lines])


def test_window_batcher_coverage():
    k = 5
    cfg = windows.WindowConfig(k=k, positions_per_row=8, rows_per_batch=3)
    seqs = [
        (0, dna.encode("ACGTACGTACGTACGTACGT")),  # L=20, n_pos=16 -> 2 rows
        (1, dna.encode("AC")),  # shorter than k -> skipped
        (2, dna.encode("ACGTNAC")),  # L=7, n_pos=3 -> 1 row
    ]
    batches = list(windows.iter_window_batches(iter(seqs), cfg))
    assert len(batches) == 1
    b = batches[0]
    assert b.codes.shape == (3, 8 + k + 1)
    np.testing.assert_array_equal(b.seq_id, [0, 0, 2])
    np.testing.assert_array_equal(b.pos0, [1, 9, 1])
    np.testing.assert_array_equal(b.valid, [8, 8, 3])
    np.testing.assert_array_equal(b.n_pos, [16, 16, 3])
    # row 0: chars S'[0 : 14] = N + first 13 chars
    np.testing.assert_array_equal(
        b.codes[0], dna.encode("NACGTACGTACGTA")
    )
    # row 1 of seq 0: positions 9..16, chars S'[8:22] (padded seq len 22)
    np.testing.assert_array_equal(
        b.codes[1], dna.encode("TACGTACGTACGTN")
    )
    # seq 2 row: S' = N ACGTNAC N, chars S'[0:9] then pad
    np.testing.assert_array_equal(
        b.codes[2], dna.encode("NACGTNACN") .tolist() + [4] * 5
    )
    assert windows.count_rows([20, 2, 7], cfg) == 3


def test_chunk_writer_matches_batch_writer(tmp_path):
    """ChunkWriter across arbitrary chunk boundaries must be
    byte-identical to write_records_with_separators on the whole
    stream, including skipped chromosomes and chunk-straddling
    transitions."""
    import numpy as np
    from twopaco_tpu.io import junctions as jio

    rng = np.random.default_rng(11)
    n = 5000
    chrs = np.sort(rng.choice([0, 1, 2, 5, 6, 9], size=n)).astype(np.int64)
    pos = rng.integers(0, 1 << 30, n).astype(np.uint32)
    ids = rng.integers(-(1 << 40), 1 << 40, n).astype(np.int64)

    a = str(tmp_path / "a.bin")
    jio.write_records_with_separators(a, chrs, pos, ids)

    b = str(tmp_path / "b.bin")
    with jio.ChunkWriter(b) as w:
        off = 0
        for sz in (1, 7, 0, 613, 1, 2000, n):  # ragged chunks
            end = min(off + sz, n)
            w.write(chrs[off:end], pos[off:end], ids[off:end])
            off = end
    assert open(a, "rb").read() == open(b, "rb").read()
