"""Regression tests for code-review findings."""

import io

import numpy as np
import pytest

from twopaco_tpu import dna
from twopaco_tpu.formats import graphdump as gd
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.passes.pipeline import _split_rounds
from twopaco_tpu.testing import oracle


def _write_fa(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")


@pytest.mark.parametrize("short_at", [0, 1, 2])
def test_gfa_with_short_sequences(tmp_path, short_at):
    """Sequences shorter than k emit no junctions; gfa/fasta dumps must
    skip their chromosome ids (the reference would throw here)."""
    rng = np.random.default_rng(short_at)
    k = 7
    seqs = [oracle.generate_sequence(rng, 300).replace("N", "A")
            for _ in range(3)]
    seqs[short_at] = "ACG"  # < k
    fa = str(tmp_path / "x.fa")
    _write_fa(fa, seqs)
    out = str(tmp_path / "o.bin")
    cfg = PipelineConfig(
        k=k, filter_bits=20, positions_per_row=64, rows_per_batch=2
    )
    build_junctions([fa], cfg, out_path=out)
    buf = io.StringIO()
    gd.generate_gfa(out, [fa], k, buf, version=1)
    text = buf.getvalue()
    assert text.startswith("H\tVN:Z:1.0")
    # paths must exist for both long sequences and spell them back
    paths = [l for l in text.splitlines() if l.startswith("P\t")]
    assert len(paths) == 2
    buf2 = io.StringIO()
    gd.generate_fasta(out, [fa], k, buf2)
    assert buf2.getvalue().startswith(">")


def test_split_rounds_mass_in_last_bin():
    """Greedy boundary landing on the final bin must not overflow uint32
    (previously produced low = 2^32)."""
    hist = np.zeros(1 << 16, np.int64)
    hist[-1] = 1000
    iv = _split_rounds(hist, 2, 16)
    assert len(iv) == 2
    for low, high in iv:
        assert 0 <= low < (1 << 32)
        assert 0 <= high < (1 << 32)
    # intervals are disjoint: the degenerate one is inverted (empty)
    assert iv[1][0] > iv[1][1] or iv[0][1] < iv[1][0]


def test_single_round_with_judge_chunk_padding(tmp_path, monkeypatch):
    """Single-round runs where B*P does not divide JUDGE_CHUNK must not
    hit the multi-round overflow check (review finding 4)."""
    from twopaco_tpu.passes import sortpipe

    monkeypatch.setattr(sortpipe, "JUDGE_CHUNK", 1024)
    rng = np.random.default_rng(9)
    s = oracle.generate_sequence(rng, 2000)
    out = str(tmp_path / "o.bin")
    cfg = PipelineConfig(
        k=7, filter_bits=20, positions_per_row=96, rows_per_batch=2
    )
    enum = build_junctions(
        None, cfg, out_path=out, sequences=[(0, dna.encode(s))]
    )
    # compare against default-chunk output: must be byte-identical
    out2 = str(tmp_path / "o2.bin")
    monkeypatch.setattr(sortpipe, "JUDGE_CHUNK", 1 << 20)
    build_junctions(
        None, cfg, out_path=out2, sequences=[(0, dna.encode(s))]
    )
    assert open(out, "rb").read() == open(out2, "rb").read()


def test_bloom_bit_layout_f_cap():
    from twopaco_tpu.ops import bloom

    assert bloom.choose_layout(35) == "bit"
    with pytest.raises(ValueError, match="dist-bloom"):
        bloom.choose_layout(36)


def test_big_f_layout_routing():
    """Reference README.md:71-79 recommends f up to 40 on big hosts:
    the sort engines accept any f (no filter), dist-bloom resolves the
    layout per shard, single-chip bloom errors with guidance."""
    from twopaco_tpu.passes import PipelineConfig

    c38 = PipelineConfig(k=25, filter_bits=38)
    # per-device: 2^35 slots on 8 devices -> bit layout fits
    assert c38.resolve_layout(shard_devices=8) == "bit"
    assert PipelineConfig(k=25, filter_bits=40).resolve_layout(
        shard_devices=64
    ) == "bit"
    with pytest.raises(ValueError, match="per device"):
        c38.resolve_layout()  # single chip: too big
    # filterless path (sort engines): no layout check at any f
    cfg = PipelineConfig(k=25, filter_bits=40).pass_config(
        filterless=True
    )
    assert cfg.f == 40


def test_cli_f40_sort_engine_runs(tmp_path):
    """-f 40 with the default engine must run (hash width only)."""
    from twopaco_tpu.cli import twopaco as cli

    fa = tmp_path / "t.fa"
    fa.write_text(">s\n" + "ACGTTGCAACGGTTAACCGGTTAA" * 8 + "\n")
    out40 = str(tmp_path / "o40.bin")
    out20 = str(tmp_path / "o20.bin")
    assert cli.main(["-k", "9", "-f", "40", "-o", out40, str(fa)]) == 0
    assert cli.main(["-k", "9", "-f", "20", "-o", out20, str(fa)]) == 0
    assert open(out40, "rb").read() == open(out20, "rb").read()


def test_sortshard_abundance_applied():
    import jax
    import jax.numpy as jnp

    from twopaco_tpu.io import windows
    from twopaco_tpu.parallel.sharded import make_mesh
    from twopaco_tpu.parallel.sortshard import (
        SortShardConfig,
        sharded_sort_step,
    )
    from twopaco_tpu.passes import kernels

    mesh = make_mesh(8)
    k = 7
    cfg = kernels.PassConfig(k=k, positions_per_row=64, rows_per_batch=8)
    scfg = SortShardConfig(base=cfg, n_devices=8)
    wcfg = windows.WindowConfig(k=k, positions_per_row=64, rows_per_batch=8)
    rng = np.random.default_rng(3)
    # 4 identical sequences, one window row each (fits a single batch):
    # every junction k-mer occurs exactly a multiple of 4 times
    base = oracle.generate_sequence(rng, 60).replace("N", "C")
    seqs = [(i, dna.encode(base)) for i in range(4)]
    b = next(windows.iter_window_batches(iter(seqs), wcfg))
    assert int((b.seq_id >= 0).sum()) == 4  # all rows in this batch
    low, high = jnp.uint32(0), jnp.uint32(0xFFFFFFFF)
    step = sharded_sort_step(mesh, scfg, check_abundance=True)
    *_rest, n_junc, n_occ, overflow = step(
        jnp.asarray(b.codes), jnp.asarray(b.valid), low, high,
        jnp.uint64(2),  # every junction occurs >= 4 times -> all dropped
    )
    assert int(overflow) == 0
    assert int(n_junc) == 0


def test_explicit_layout_capacity_checked():
    """An explicitly-set --tpu-layout must hit the same actionable
    capacity error as 'auto' (not a trace-time OverflowError from the
    int32 fill sentinel): bit/block cap at 2^35 slots per device,
    byte at 2^30."""
    from twopaco_tpu.passes import PipelineConfig

    with pytest.raises(ValueError, match="dist-bloom"):
        PipelineConfig(k=25, filter_bits=36, layout="bit").resolve_layout()
    with pytest.raises(ValueError, match="dist-bloom"):
        PipelineConfig(k=25, filter_bits=31, layout="byte").resolve_layout()
    # sharding brings the per-device slice back under the cap
    assert (
        PipelineConfig(k=25, filter_bits=38, layout="bit").resolve_layout(
            shard_devices=8
        )
        == "bit"
    )
