"""End-to-end distributed engine vs the single-device sort engine.

The distributed engine must be byte-identical: same junction table,
same ids, same .dbg bytes (our runs are deterministic by construction —
SURVEY.md §5's determinism note is about the REFERENCE being seeded
from urandom; we are not)."""

import os

import numpy as np
import jax
import pytest

from twopaco_tpu import dna
from twopaco_tpu.parallel.distpipe import (
    build_junctions_dist,
    route_bounds_from_hist,
    word0_histogram,
)
from twopaco_tpu.parallel.sharded import make_mesh
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle


def _corpus(seed=7, n=3, length=2000, snp=0.05, ins=0.1):
    rng = np.random.default_rng(seed)
    base = oracle.generate_sequence(rng, length)
    seqs = [(0, dna.encode(base))]
    for i in range(1, n):
        seqs.append(
            (i, dna.encode(oracle.mutate_sequence(rng, base, snp, ins)))
        )
    return seqs


def _run_pair(tmp_path, config, seqs, mesh):
    ours = os.path.join(tmp_path, "dist.dbg")
    ref = os.path.join(tmp_path, "single.dbg")
    enum_d = build_junctions_dist(
        None, config, mesh=mesh, out_path=ours, sequences=seqs
    )
    enum_s = build_junctions(None, config, out_path=ref, sequences=seqs)
    assert enum_d.vertices_count == enum_s.vertices_count
    np.testing.assert_array_equal(
        enum_d.junction_words, enum_s.junction_words
    )
    with open(ours, "rb") as f1, open(ref, "rb") as f2:
        assert f1.read() == f2.read()
    return enum_d


@pytest.mark.parametrize("rounds", [1, 3])
def test_dist_engine_byte_identical(tmp_path, rounds):
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    config = PipelineConfig(
        k=9,
        rounds=rounds,
        positions_per_row=128,
        rows_per_batch=8,
    )
    enum = _run_pair(str(tmp_path), config, _corpus(), mesh)
    assert enum.vertices_count > 0
    assert enum.stats.occurrences > 0


def test_dist_engine_multi_device_counts(tmp_path):
    """Junctions must actually spread across devices (not all on one)."""
    mesh = make_mesh(8)
    config = PipelineConfig(
        k=11, positions_per_row=128, rows_per_batch=8
    )
    seqs = _corpus(seed=11, n=4, length=3000)
    enum = _run_pair(str(tmp_path), config, seqs, mesh)
    assert enum.vertices_count > 50


def test_quantile_bounds_route_skewed_input(tmp_path):
    """VERDICT item 3: a ~90% AT-rich corpus concentrates word0 in a
    narrow range; uniform word0 ownership would overflow at slack 1.25
    while measured quantile boundaries route it without overflow."""
    rng = np.random.default_rng(5)
    n, length = 4, 4000
    at = np.array([0, 3], np.uint8)  # A/T codes
    seqs = []
    for i in range(n):
        codes = np.where(
            rng.random(length) < 0.9,
            at[rng.integers(0, 2, size=length)],
            rng.integers(0, 4, size=length).astype(np.uint8),
        ).astype(np.uint8)
        seqs.append((i, codes))
    mesh = make_mesh(8)
    config = PipelineConfig(
        k=9,
        positions_per_row=128,
        rows_per_batch=8,
        round_slack=1.25,
    )
    # must not raise the overflow RuntimeError
    enum = _run_pair(str(tmp_path), config, seqs, mesh)
    assert enum.vertices_count > 0


def test_multihost_degenerate_single_process(tmp_path):
    """The multi-host entry point (process init, host-sharded put,
    allgather fetch, single-writer) must run degenerate under one
    process and produce byte-identical output (VERDICT item 7)."""
    from twopaco_tpu.parallel.multihost import build_junctions_multihost

    config = PipelineConfig(
        k=9, rounds=2, positions_per_row=128, rows_per_batch=8
    )
    seqs = _corpus(seed=3)
    ours = os.path.join(str(tmp_path), "mh.dbg")
    ref = os.path.join(str(tmp_path), "single.dbg")
    enum_m = build_junctions_multihost(
        None, config, out_path=ours, sequences=seqs
    )
    enum_s = build_junctions(None, config, out_path=ref, sequences=seqs)
    assert enum_m.vertices_count == enum_s.vertices_count
    with open(ours, "rb") as f1, open(ref, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.parametrize("rounds", [1, 3])
def test_dist_engine_wide_positions(tmp_path, monkeypatch, rounds):
    """Forced wide (u32-pair) positions through the distributed engine:
    routing, append, judge and packed fetch must all carry two position
    columns and stay byte-identical to the single-device engine (which
    honors the same TWOPACO_POS64 switch)."""
    monkeypatch.setenv("TWOPACO_POS64", "1")
    mesh = make_mesh(8)
    config = PipelineConfig(
        k=9, rounds=rounds, positions_per_row=128, rows_per_batch=8
    )
    enum = _run_pair(str(tmp_path), config, _corpus(seed=21), mesh)
    assert enum.vertices_count > 0


def test_dist_engine_checkpoint_resume(tmp_path):
    """Round-boundary checkpoint/resume on the distributed engine: a
    resumed run (one round recomputed, others restored) must be
    byte-identical to an uncheckpointed run."""
    mesh = make_mesh(8)
    config = PipelineConfig(
        k=9, rounds=3, positions_per_row=128, rows_per_batch=8
    )
    seqs = _corpus(seed=13)
    plain = os.path.join(str(tmp_path), "plain.dbg")
    build_junctions_dist(
        None, config, mesh=mesh, out_path=plain, sequences=seqs
    )
    ck = os.path.join(str(tmp_path), "ckpt")
    first = os.path.join(str(tmp_path), "first.dbg")
    build_junctions_dist(
        None, config, mesh=mesh, out_path=first, sequences=seqs,
        checkpoint_dir=ck,
    )
    # drop one round's file: resume restores the others, recomputes it
    os.remove(os.path.join(ck, "round_1.npz"))
    resumed = os.path.join(str(tmp_path), "resumed.dbg")
    lines: list[str] = []
    build_junctions_dist(
        None, config, mesh=mesh, out_path=resumed, sequences=seqs,
        checkpoint_dir=ck, log=lines.append,
    )
    assert sum("restored from checkpoint" in s for s in lines) == 2
    with open(plain, "rb") as f:
        want = f.read()
    for p in (first, resumed):
        with open(p, "rb") as f:
            assert f.read() == want, p


def test_dist_bloom_engine_byte_identical(tmp_path):
    """engine='dist-bloom': sharded Bloom fill + candidate marking over
    the mesh, then distributed verify/emit through the sort-join tail —
    the multi-chip completion of the reference's own Bloom design
    (SURVEY.md §2.4). Must be byte-identical to the plain engines."""
    mesh = make_mesh(8)
    seqs = _corpus(seed=31)
    for rounds in (1, 2):
        config = PipelineConfig(
            k=9, rounds=rounds, filter_bits=18, hash_functions=2,
            positions_per_row=128, rows_per_batch=8,
        )
        ours = os.path.join(str(tmp_path), f"bloomdist{rounds}.dbg")
        ref = os.path.join(str(tmp_path), f"single{rounds}.dbg")
        enum_b = build_junctions_dist(
            None, config, mesh=mesh, out_path=ours, sequences=seqs,
            bloom_gate=True,
        )
        enum_s = build_junctions(
            None, config, out_path=ref, sequences=seqs
        )
        assert enum_b.vertices_count == enum_s.vertices_count
        with open(ours, "rb") as f1, open(ref, "rb") as f2:
            assert f1.read() == f2.read()


@pytest.mark.slow
def test_dist_engine_scale(tmp_path):
    """Scale validation (VERDICT r2 item 4): a multi-Mbase pangenome —
    millions of records through real batch shapes, multiple auto-rounds
    and the chunked judge — byte-identical to the single-device engine."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(17)
    base = oracle.generate_sequence(rng, 2_000_000)
    seqs = [(0, dna.encode(base))] + [
        (i, dna.encode(oracle.mutate_sequence(rng, base, 0.01, 0.1)))
        for i in range(1, 4)
    ]
    config = PipelineConfig(
        k=25,
        positions_per_row=2048,
        rows_per_batch=256,
        sort_chunk=1 << 19,  # force several auto-rounds at this size
    )
    enum = _run_pair(str(tmp_path), config, seqs, mesh)
    assert enum.vertices_count > 10_000
    assert enum.stats.occurrences > 10_000


@pytest.mark.slow
def test_dist_engine_occurrence_scale(tmp_path):
    """>=100M-record validation (VERDICT r2 item 4): a 112 Mbase
    14-strain 1%-SNP pangenome (the bench.py dataset shape, scaled)
    pushes ~1.1e8 edge records through routing, the chunked judge,
    wide buffers, and the packed per-device fetch; output must be
    byte-identical to the single-device engine. ~30-60 min on the
    8-virtual-device CPU mesh."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(99)
    base = oracle.generate_sequence(rng, 8_000_000)
    seqs = [(0, dna.encode(base))] + [
        (i, dna.encode(oracle.mutate_sequence(rng, base, 0.01, 0.0)))
        for i in range(1, 14)
    ]
    config = PipelineConfig(
        k=25,
        positions_per_row=16384,
        rows_per_batch=128,
        sort_chunk=1 << 22,
    )
    enum = _run_pair(str(tmp_path), config, seqs, mesh)
    # 64M positions x ~2 strands -> >=1e8 record occurrences judged
    assert enum.stats.occurrences > 1_000_000


def test_route_bounds_equalize_mass():
    hist = np.zeros(1 << 16, np.int64)
    # mass concentrated in 1/16 of word0 space (strong GC bias)
    hist[: 1 << 12] = 1000
    bounds = route_bounds_from_hist(hist, 8, 16)
    assert len(bounds) == 7
    assert (np.diff(bounds.astype(np.int64)) > 0).all()
    # every boundary must fall inside the populated range: an equal
    # split of the POPULATED mass, not of the raw space
    assert (bounds <= (1 << 28)).all()
