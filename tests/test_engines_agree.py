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
    # the Bloom engine runs in all three filter layouts, including the
    # vertex-blocked one (one word gather tests all 8 extensions); the
    # candidate masks may legitimately differ per layout, but the exact
    # verify makes every final output byte-identical to the sort engine
    variants = [
        ("sort", {}),
        ("bloom", {"layout": "byte"}),
        ("bloom", {"layout": "bit"}),
        ("bloom", {"layout": "block"}),
        ("bloom", {"layout": "block", "hash_functions": 5}),
    ]
    for i, (engine, extra) in enumerate(variants):
        cfg = PipelineConfig(
            k=7,
            filter_bits=20,
            rounds=rounds,
            engine=engine,
            positions_per_row=256,
            rows_per_batch=4,
            **extra,
        )
        out = str(tmp_path / f"v{i}.bin")
        enum = build_junctions(None, cfg, out_path=out, sequences=sequences)
        outs[i] = (open(out, "rb").read(), enum.vertices_count)
    for i in range(1, len(variants)):
        assert outs[0][1] == outs[i][1], variants[i]
        assert outs[0][0] == outs[i][0], variants[i]
