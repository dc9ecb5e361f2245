"""Differential checks at larger k (multi-word packed paths, w=2 and 4)."""

import numpy as np
import pytest

from twopaco_tpu import dna
from twopaco_tpu.io import junctions
from twopaco_tpu.passes import INVALID_VERTEX, PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle


@pytest.mark.parametrize("k", [31, 63])
@pytest.mark.parametrize("engine", ["sort", "bloom"])
def test_differential_large_k(tmp_path, k, engine):
    rng = np.random.default_rng(k * 100)
    base = oracle.generate_sequence(rng, 700)
    seqs = [base, oracle.mutate_sequence(rng, base, 0.04, 0.1)]
    out = str(tmp_path / "out.bin")
    cfg = PipelineConfig(
        k=k,
        filter_bits=20,
        engine=engine,
        positions_per_row=256,
        rows_per_batch=4,
    )
    enum = build_junctions(
        None,
        cfg,
        out_path=out,
        sequences=[(i, dna.encode(s)) for i, s in enumerate(seqs)],
    )
    junc, want = oracle.find_junctions_naively(seqs, k)
    c, pos, _ids = junctions.read_junctions(out)
    got = [np.zeros(len(s), bool) for s in seqs]
    for cc, pp in zip(c, pos):
        got[cc][pp] = True
    for i in range(len(seqs)):
        np.testing.assert_array_equal(got[i], want[i])
    for v in junc:
        assert enum.get_id(v) != INVALID_VERTEX
