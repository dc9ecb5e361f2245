"""Wide (>4.2 Gbase) position path: a second u32 position column with
host-exact base + device carry replaces the reference's native size_t
positions (vertexenumerator.h:935-958). TWOPACO_POS64=1 forces the wide
path on small inputs so it can be tested end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from twopaco_tpu import dna
from twopaco_tpu.io import windows
from twopaco_tpu.passes import PipelineConfig, build_junctions
from twopaco_tpu.passes import sortpipe
from twopaco_tpu.testing import oracle


def test_pos_base_carry_math():
    """The (hi, lo) pair must equal row0*P + offset exactly for bases
    beyond 2^32, including offsets that carry across the u32 boundary."""
    P = 1 << 14
    for row0 in (0, 1, 261900, 262144, 5_000_000):  # 262144*P = 2^32
        base = sortpipe._pos_base(row0, P, wide=True)
        want = row0 * P
        assert int(base[0]) == want >> 32 and int(base[1]) == want & (
            (1 << 32) - 1
        )
    # carry propagation: base_lo near 2^32, offsets cross the boundary
    hi, lo = jnp.uint32(3), jnp.uint32(0xFFFFFF00)
    off = jnp.arange(0x300, dtype=jnp.uint32)
    lo2 = lo + off
    carry = (lo2 < lo).astype(jnp.uint32)
    got = (np.asarray(hi + carry).astype(np.int64) << 32) | np.asarray(
        lo2
    ).astype(np.int64)
    want = (3 << 32) + 0xFFFFFF00 + np.arange(0x300)
    np.testing.assert_array_equal(got, want)


def test_batch_records_wide_positions():
    """Wide flat positions from _batch_records must equal the exact
    row0*P + in-batch offset for a base beyond 2^32."""
    cfg = PipelineConfig(
        k=7, filter_bits=16, positions_per_row=64, rows_per_batch=2
    ).pass_config()
    rng = np.random.default_rng(5)
    seq = oracle.generate_sequence(rng, 100)
    wcfg = PipelineConfig(
        k=7, filter_bits=16, positions_per_row=64, rows_per_batch=2
    ).window_config()
    b = next(
        windows.iter_window_batches(iter([(0, dna.encode(seq))]), wcfg)
    )
    row0 = 70_000_000  # row0 * P = 4.48e9 > 2^32
    base = sortpipe._pos_base(row0, cfg.P, wide=True)
    _w, _p, pos = sortpipe.build_sort_records(
        jnp.asarray(b.codes), jnp.asarray(b.valid), base,
        jnp.uint32(0), jnp.uint32(0xFFFFFFFF), cfg=cfg,
    )
    got = sortpipe._host_pos(pos)
    B, P = b.codes.shape[0], cfg.P
    want = row0 * P + np.arange(B * P)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("wide", ["0", "1"])
def test_scan_stream_mode_byte_identical(tmp_path, monkeypatch, wide):
    """The non-resident multi-round path (one lax.scan program per
    round over stacked batches) must match resident-parts output
    byte-for-byte, in both narrow and wide position modes."""
    rng = np.random.default_rng(123)
    base = oracle.generate_sequence(rng, 1500)
    seqs = [base] + [
        oracle.mutate_sequence(rng, base, 0.03, 0.1) for _ in range(2)
    ]
    sequences = [(i, s) for i, s in enumerate(map(dna.encode, seqs))]
    monkeypatch.setenv("TWOPACO_POS64", wide)
    outs = {}
    for mode in ("resident", "stream"):
        monkeypatch.setenv(
            "TWOPACO_RESIDENT", "1" if mode == "resident" else "0"
        )
        cfg = PipelineConfig(
            k=9, filter_bits=20, rounds=3,
            positions_per_row=256, rows_per_batch=4,
        )
        out = str(tmp_path / f"{mode}{wide}.bin")
        build_junctions(None, cfg, out_path=out, sequences=sequences)
        outs[mode] = open(out, "rb").read()
    assert outs["resident"] == outs["stream"]


@pytest.mark.parametrize("rounds", [1, 3])
def test_wide_path_byte_identical(tmp_path, monkeypatch, rounds):
    """Forced wide positions must produce a byte-identical .dbg on a
    normal input, in both single- and multi-round (resident) modes."""
    rng = np.random.default_rng(99 + rounds)
    base = oracle.generate_sequence(rng, 1500)
    seqs = [base] + [
        oracle.mutate_sequence(rng, base, 0.03, 0.1) for _ in range(2)
    ]
    sequences = [(i, s) for i, s in enumerate(map(dna.encode, seqs))]
    outs = {}
    for mode in ("narrow", "wide", "wide-config"):
        monkeypatch.setenv(
            "TWOPACO_POS64", "1" if mode == "wide" else "0"
        )
        cfg = PipelineConfig(
            k=9,
            filter_bits=20,
            rounds=rounds,
            positions_per_row=256,
            rows_per_batch=4,
            # the --tpu-wide CLI path: config flag instead of env
            force_wide=(mode == "wide-config"),
        )
        out = str(tmp_path / f"{mode}.bin")
        enum = build_junctions(
            None, cfg, out_path=out, sequences=sequences
        )
        outs[mode] = (open(out, "rb").read(), enum.vertices_count)
    assert outs["narrow"][1] == outs["wide"][1]
    assert outs["narrow"][0] == outs["wide"][0]
    assert outs["wide-config"][0] == outs["wide"][0]
