"""Differential checks at larger k (multi-word packed paths, w=2..5),
plus byte/partition parity vs the reference binary at k=101/129."""

import os
import sys

import numpy as np
import pytest

from twopaco_tpu import dna
from twopaco_tpu.io import junctions
from twopaco_tpu.passes import INVALID_VERTEX, PipelineConfig, build_junctions
from twopaco_tpu.testing import oracle


@pytest.mark.parametrize(
    "k",
    [
        31,
        63,
        # end-to-end coverage of the w>=4 multi-word paths the reference
        # supports up to k=604 (vertexenumerator.cpp:56-70): k=101 (w=4),
        # k=127 (w=4, full last word), k=129 (w=5)
        101,
        127,
        129,
        # the reference ceiling's neighborhood (CAPACITY<=19 uint64
        # words => max odd k=603, candidateoccurence.h:129-133)
        pytest.param(311, marks=pytest.mark.slow),
        pytest.param(603, marks=pytest.mark.slow),
    ],
)
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


# --- large-k parity vs the reference binary (goldens committed from
# /tmp/refbuild runs of twopaco + graphdump at k=101/129 on largek.fa,
# reference capacity dispatch: vertexenumerator.cpp:56-70) ---

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
LK_FA = os.path.join(GOLD, "largek.fa")


def _golden(name: str) -> str:
    with open(os.path.join(GOLD, name)) as fh:
        return fh.read()


@pytest.mark.parametrize("k", [101, 129, 311, 603])
@pytest.mark.parametrize("fmt", ["seq", "group", "dot", "gfa1", "gfa2", "fasta"])
def test_graphdump_large_k_byte_parity(k, fmt):
    """All six output formats byte-match the reference graphdump binary
    on the reference's own .dbg at w>=4 k (multi-word id decode)."""
    import io as _io

    from twopaco_tpu.formats import graphdump as gd

    dbg = os.path.join(GOLD, f"largek_k{k}.dbg")
    buf = _io.StringIO()
    if fmt == "seq":
        gd.generate_seq(dbg, out=buf)
    elif fmt == "group":
        gd.generate_group(dbg, out=buf)
    elif fmt == "dot":
        gd.generate_dot(dbg, out=buf)
    elif fmt == "gfa1":
        gd.generate_gfa(dbg, [LK_FA], k, version=1, out=buf)
    elif fmt == "gfa2":
        gd.generate_gfa(dbg, [LK_FA], k, version=2, out=buf)
    else:
        gd.generate_fasta(dbg, [LK_FA], k, out=buf)
    assert buf.getvalue() == _golden(f"largek_k{k}.{fmt}")


@pytest.mark.parametrize(
    "k",
    [
        101,
        129,
        pytest.param(311, marks=pytest.mark.slow),
        pytest.param(603, marks=pytest.mark.slow),
    ],
)
@pytest.mark.parametrize("engine", ["sort", "bloom"])
def test_constructor_large_k_partition_parity(tmp_path, k, engine):
    """Our constructor's junction positions + group partition match the
    reference binary's .dbg on the same input (ids are urandom-seeded in
    the reference and are never compared raw)."""
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts"),
    )
    import check_parity as cp

    out = str(tmp_path / "ours.dbg")
    cfg = PipelineConfig(
        k=k, filter_bits=16, engine=engine,
        positions_per_row=256, rows_per_batch=8,
    )
    build_junctions([LK_FA], cfg, out_path=out)
    assert cp.partitions_equal(
        junctions.read_junctions(out),
        junctions.read_junctions(os.path.join(GOLD, f"largek_k{k}.dbg")),
    )
