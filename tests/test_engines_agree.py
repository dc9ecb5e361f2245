"""The sort-join and Bloom engines must produce byte-identical output."""

import numpy as np
import pytest

from twopaco_tpu import dna
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle


@pytest.mark.parametrize("rounds", [1, 2])
def test_engines_byte_identical(tmp_path, rounds):
    rng = np.random.default_rng(31337 + rounds)
    base = oracle.generate_sequence(rng, 1200)
    seqs = [base] + [
        oracle.mutate_sequence(rng, base, 0.03, 0.1) for _ in range(2)
    ]
    sequences = [(i, dna.encode(s)) for i, s in enumerate(seqs)]
    outs = {}
    for engine in ("sort", "bloom"):
        cfg = PipelineConfig(
            k=7,
            filter_bits=20,
            rounds=rounds,
            engine=engine,
            positions_per_row=256,
            rows_per_batch=4,
        )
        out = str(tmp_path / f"{engine}.bin")
        enum = build_junctions(None, cfg, out_path=out, sequences=sequences)
        outs[engine] = (open(out, "rb").read(), enum.vertices_count)
    assert outs["sort"][1] == outs["bloom"][1]
    assert outs["sort"][0] == outs["bloom"][0]
