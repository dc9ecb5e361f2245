"""Sort engine auto-rounds: bounded per-round sorts, identical output."""

import numpy as np

from twopaco_tpu import dna
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle


def test_auto_rounds_chunked_sorts_match(tmp_path):
    rng = np.random.default_rng(4242)
    base = oracle.generate_sequence(rng, 3000)
    seqs = [base, oracle.mutate_sequence(rng, base, 0.02, 0.1)]
    sequences = [(i, dna.encode(s)) for i, s in enumerate(seqs)]
    outs = []
    # sort_chunk 1024 forces many rounds + the compaction/append path
    for chunk in (1 << 23, 1024):
        cfg = PipelineConfig(
            k=9,
            filter_bits=20,
            engine="sort",
            positions_per_row=256,
            rows_per_batch=4,
            sort_chunk=chunk,
        )
        out = str(tmp_path / f"c{chunk}.bin")
        enum = build_junctions(None, cfg, out_path=out, sequences=sequences)
        outs.append((open(out, "rb").read(), enum.vertices_count))
    assert outs[0][1] == outs[1][1] > 0
    assert outs[0][0] == outs[1][0]


def test_overflow_detection(tmp_path):
    import pytest

    rng = np.random.default_rng(7)
    seqs = [oracle.generate_sequence(rng, 2000)]
    sequences = [(0, dna.encode(seqs[0]))]
    cfg = PipelineConfig(
        k=9,
        engine="sort",
        positions_per_row=8,
        rows_per_batch=1,
        sort_chunk=16,
        round_slack=0.1,  # force a too-small round buffer
    )
    with pytest.raises(RuntimeError, match="overflow"):
        build_junctions(
            None, cfg, out_path=str(tmp_path / "x.bin"), sequences=sequences
        )

def test_bucket_slots():
    from twopaco_tpu.passes.sortpipe import JUDGE_CHUNK, _bucket_slots

    # pow2 buckets below JUDGE_CHUNK (16k floor) bound the compiled
    # program set across arbitrary small-input sizes
    assert _bucket_slots(1) == 1 << 14
    assert _bucket_slots(16384) == 16384
    assert _bucket_slots(16385) == 32768
    assert _bucket_slots(JUDGE_CHUNK - 1) == JUDGE_CHUNK
    # JUDGE_CHUNK multiples above
    assert _bucket_slots(JUDGE_CHUNK) == JUDGE_CHUNK
    assert _bucket_slots(JUDGE_CHUNK + 1) == 2 * JUDGE_CHUNK
    assert _bucket_slots(5 * JUDGE_CHUNK - 3) == 5 * JUDGE_CHUNK
    # always >= m
    for m in (3, 999, 100_000, 3_000_000):
        assert _bucket_slots(m) >= m


def test_uniform_vs_hist_split_identical_output(tmp_path, monkeypatch):
    """Round intervals are internal: the uniform hash-space split and
    the measured-histogram split must produce byte-identical output."""
    rng = np.random.default_rng(99)
    base = oracle.generate_sequence(rng, 4000)
    seqs = [base, oracle.mutate_sequence(rng, base, 0.02, 0.05)]
    sequences = [(i, dna.encode(s)) for i, s in enumerate(seqs)]
    outs = []
    for mode in ("1", "0"):
        monkeypatch.setenv("TWOPACO_UNIFORM_SPLIT", mode)
        cfg = PipelineConfig(
            k=9,
            filter_bits=20,
            engine="sort",
            positions_per_row=256,
            rows_per_batch=4,
            sort_chunk=2048,  # forces multiple rounds
        )
        out = str(tmp_path / f"m{mode}.bin")
        enum = build_junctions(None, cfg, out_path=out, sequences=sequences)
        outs.append((open(out, "rb").read(), enum.vertices_count))
    assert outs[0][1] == outs[1][1] > 0
    assert outs[0][0] == outs[1][0]
