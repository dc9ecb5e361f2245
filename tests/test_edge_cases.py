"""Edge cases: multi-file inputs, empty/tiny sequences, CLI --test."""

import numpy as np
import pytest

from twopaco_tpu import dna
from twopaco_tpu.cli import twopaco as tp_cli
from twopaco_tpu.io import junctions
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle, selftest


def test_multi_file_input(tmp_path):
    """Sequence ids are global across files in CLI order
    (streamfastaparser.h:140-182 ChrReader semantics)."""
    rng = np.random.default_rng(5)
    s1, s2, s3 = (oracle.generate_sequence(rng, 300) for _ in range(3))
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    f1.write_text(f">x\n{s1}\n>y\n{s2}\n")
    f2.write_text(f">z\n{s3}\n")
    out = str(tmp_path / "o.bin")
    cfg = PipelineConfig(
        k=9, filter_bits=20, positions_per_row=128, rows_per_batch=4
    )
    build_junctions([str(f1), str(f2)], cfg, out_path=out)
    c, pos, ids = junctions.read_junctions(out)
    assert set(c.tolist()) == {0, 1, 2}
    # matches single-file order of the same sequences
    out2 = str(tmp_path / "o2.bin")
    build_junctions(
        None,
        cfg,
        out_path=out2,
        sequences=[(i, dna.encode(s)) for i, s in enumerate([s1, s2, s3])],
    )
    assert open(out, "rb").read() == open(out2, "rb").read()


def test_sequences_shorter_than_k(tmp_path):
    """< k sequences produce no records and no stubs, but still occupy a
    chromosome id (separators advance past them)."""
    seqs = ["ACGTACGTACGTACGT", "AC", "TTGGTTGGAAGGTTGG"]
    out = str(tmp_path / "o.bin")
    cfg = PipelineConfig(
        k=9, filter_bits=20, positions_per_row=64, rows_per_batch=2
    )
    build_junctions(
        None,
        cfg,
        out_path=out,
        sequences=[(i, dna.encode(s)) for i, s in enumerate(seqs)],
    )
    c, pos, ids = junctions.read_junctions(out)
    assert 1 not in set(c.tolist())
    assert {0, 2} <= set(c.tolist())  # stubs at least


def test_all_n_sequence(tmp_path):
    out = str(tmp_path / "o.bin")
    cfg = PipelineConfig(
        k=5, filter_bits=16, positions_per_row=64, rows_per_batch=2
    )
    enum = build_junctions(
        None,
        cfg,
        out_path=out,
        sequences=[(0, dna.encode("N" * 40))],
    )
    assert enum.vertices_count == 0
    c, pos, ids = junctions.read_junctions(out)
    # first/last k-mers contain N -> still stub junctions (reference
    # emits stubs whenever bifId == INVALID at the endpoints)
    assert len(ids) == 2
    assert (ids >= 42).all()


def test_cli_selftest_smoke(capsys):
    ok = selftest.run_tests(
        tests=1,
        length=400,
        chr_number=2,
        k_values=(5,),
        rounds_values=(1, 2),
        seed=11,
    )
    assert ok
