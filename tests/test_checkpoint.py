"""Round-boundary checkpoint/resume (both engines)."""

import os

import numpy as np

from twopaco_tpu import dna
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle


def _run(seqs, out, ck, rounds=3, k=9, engine="sort"):
    cfg = PipelineConfig(
        k=k,
        filter_bits=20,
        rounds=rounds,
        engine=engine,
        positions_per_row=128,
        rows_per_batch=4,
    )
    return build_junctions(
        None,
        cfg,
        out_path=out,
        sequences=[(i, dna.encode(s)) for i, s in enumerate(seqs)],
        checkpoint_dir=ck,
    )


def test_resume_produces_identical_output(tmp_path):
    rng = np.random.default_rng(77)
    base = oracle.generate_sequence(rng, 1500)
    seqs = [base, oracle.mutate_sequence(rng, base, 0.03, 0.1)]
    ck = str(tmp_path / "ck")

    out1 = str(tmp_path / "a.bin")
    _run(seqs, out1, ck)
    assert {f for f in os.listdir(ck) if f.startswith("round_")} == {
        f"round_{r}.npz" for r in range(3)
    }

    # resume: all rounds restored, byte-identical output
    logs = []
    out2 = str(tmp_path / "b.bin")
    cfg = PipelineConfig(
        k=9, filter_bits=20, rounds=3, positions_per_row=128,
        rows_per_batch=4,
    )
    build_junctions(
        None,
        cfg,
        out_path=out2,
        sequences=[(i, dna.encode(s)) for i, s in enumerate(seqs)],
        checkpoint_dir=ck,
        log=logs.append,
    )
    assert sum("restored from checkpoint" in l for l in logs) == 3
    assert open(out1, "rb").read() == open(out2, "rb").read()


def test_partial_resume(tmp_path):
    rng = np.random.default_rng(78)
    seqs = [oracle.generate_sequence(rng, 1200)]
    ck = str(tmp_path / "ck")
    out1 = str(tmp_path / "a.bin")
    _run(seqs, out1, ck)
    os.remove(os.path.join(ck, "round_1.npz"))  # simulate interrupt
    out2 = str(tmp_path / "b.bin")
    _run(seqs, out2, ck)
    assert open(out1, "rb").read() == open(out2, "rb").read()


def test_bloom_engine_resume(tmp_path):
    """The bloom engine checkpoints too (VERDICT round-1 gap): full
    restore must be byte-identical, and a sort-engine checkpoint dir
    must be invalidated rather than wrongly reused."""
    rng = np.random.default_rng(80)
    base = oracle.generate_sequence(rng, 1500)
    seqs = [base, oracle.mutate_sequence(rng, base, 0.03, 0.1)]
    ck = str(tmp_path / "ck")
    out1 = str(tmp_path / "a.bin")
    _run(seqs, out1, ck, engine="bloom")
    assert {f for f in os.listdir(ck) if f.startswith("round_")} == {
        f"round_{r}.npz" for r in range(3)
    }
    logs = []
    out2 = str(tmp_path / "b.bin")
    cfg = PipelineConfig(
        k=9, filter_bits=20, rounds=3, engine="bloom",
        positions_per_row=128, rows_per_batch=4,
    )
    build_junctions(
        None, cfg, out_path=out2,
        sequences=[(i, dna.encode(s)) for i, s in enumerate(seqs)],
        checkpoint_dir=ck, log=logs.append,
    )
    assert sum("restored from checkpoint" in l for l in logs) == 3
    assert open(out1, "rb").read() == open(out2, "rb").read()

    # engine switch on the same dir: meta mismatch -> fresh rounds,
    # still byte-identical output (engines agree)
    out3 = str(tmp_path / "c.bin")
    _run(seqs, out3, ck, engine="sort")
    assert open(out1, "rb").read() == open(out3, "rb").read()


def test_config_change_invalidates(tmp_path):
    rng = np.random.default_rng(79)
    seqs = [oracle.generate_sequence(rng, 1200)]
    ck = str(tmp_path / "ck")
    _run(seqs, str(tmp_path / "a.bin"), ck, k=9)
    _run(seqs, str(tmp_path / "b.bin"), ck, k=7)  # different k
    # checkpoints regenerated for the new parameters, run still correct
    junc, want = oracle.find_junctions_naively(seqs, 7)
    from twopaco_tpu.io import junctions as jio

    c, pos, _ids = jio.read_junctions(str(tmp_path / "b.bin"))
    got = np.zeros(len(seqs[0]), bool)
    got[pos] = True
    np.testing.assert_array_equal(got, want[0])


def test_resident_resume_skips_partition(tmp_path):
    """A COMPLETE matching checkpoint restores every resident round
    without re-running the full-input partition scan (the dominant
    device phase); a partial checkpoint must still partition."""
    from twopaco_tpu.passes.sortpipe import build_junctions_sorted

    rng = np.random.default_rng(83)
    base = oracle.generate_sequence(rng, 2000)
    seqs = [(0, dna.encode(base)),
            (1, dna.encode(oracle.mutate_sequence(rng, base, 0.04, 0.1)))]
    cfg = PipelineConfig(k=9, rounds=3, positions_per_row=128,
                         rows_per_batch=4)
    ck = str(tmp_path / "ck")
    out1, out2, out3 = (str(tmp_path / n) for n in ("a.dbg", "b.dbg",
                                                    "c.dbg"))
    build_junctions_sorted(None, cfg, out_path=out1, sequences=seqs,
                           checkpoint_dir=ck)

    logs = []
    build_junctions_sorted(None, cfg, out_path=out2, sequences=seqs,
                           checkpoint_dir=ck, log=logs.append)
    assert any("skipping partition" in l for l in logs), logs
    assert sum("restored from checkpoint" in l for l in logs) == 3
    assert open(out1, "rb").read() == open(out2, "rb").read()

    # partial checkpoint: fast path must NOT trigger; output identical
    os.remove(os.path.join(ck, "round_1.npz"))
    logs2 = []
    build_junctions_sorted(None, cfg, out_path=out3, sequences=seqs,
                           checkpoint_dir=ck, log=logs2.append)
    assert not any("skipping partition" in l for l in logs2)
    assert open(out1, "rb").read() == open(out3, "rb").read()
