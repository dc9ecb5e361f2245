"""Round-trip tests for the 4-byte packed occurrence fetch
(sortpipe._pack_occ / _unpack_occ): positions with large gaps go
through the exception table; narrow and wide (u32-pair) positions;
dynamic delta/lid splits.
"""

import numpy as np
import pytest

from twopaco_tpu.passes import sortpipe


def _roundtrip(pos, oi, cap, exc_cap, delta_bits, wide=False):
    import jax.numpy as jnp

    n = len(pos)
    pad = np.zeros(cap - n, np.uint32)
    if wide:
        hi = (pos >> 32).astype(np.uint32)
        lo = (pos & 0xFFFFFFFF).astype(np.uint32)
        pos_d = (
            jnp.asarray(np.concatenate([hi, pad])),
            jnp.asarray(np.concatenate([lo, pad])),
        )
    else:
        pos_d = (jnp.asarray(np.concatenate([pos.astype(np.uint32), pad])),)
    oi_d = jnp.asarray(
        np.concatenate([oi, np.zeros(cap - n, np.int32)])
    )
    packed, exc_i, exc_hi, exc_lo, n_exc = sortpipe._pack_occ(
        pos_d, oi_d, jnp.uint32(n), exc_cap=exc_cap, delta_bits=delta_bits
    )
    assert 0 <= int(n_exc) <= n
    return sortpipe._unpack_occ(
        np.asarray(packed)[:n],
        np.asarray(exc_i),
        np.asarray(exc_hi),
        np.asarray(exc_lo),
        delta_bits,
    )


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("delta_bits", [11, 14])
def test_pack_occ_roundtrip(wide, delta_bits):
    rng = np.random.default_rng(delta_bits + wide)
    n = 5000
    # mix of tiny deltas and huge jumps (every ~100th gap > 2^delta)
    deltas = rng.integers(1, 200, size=n).astype(np.uint64)
    big = rng.random(n) < 0.01
    deltas[big] += rng.integers(
        1 << delta_bits, 1 << 22, size=int(big.sum()), dtype=np.uint64
    )
    base = np.uint64(5 << 32) if wide else np.uint64(0)
    pos = (np.cumsum(deltas) + base).astype(np.int64)
    if not wide:
        assert int(pos[-1]) < (1 << 32)
    lid_bits = 31 - delta_bits
    lid = rng.integers(1, 1 << lid_bits, size=n).astype(np.int32)
    sign = rng.random(n) < 0.5
    oi = np.where(sign, -lid, lid).astype(np.int32)

    # feed shuffled (k-mer order), expect position-sorted back
    perm = rng.permutation(n)
    got_pos, got_sign, got_lid = _roundtrip(
        pos[perm].astype(np.uint64), oi[perm],
        cap=8192, exc_cap=1024, delta_bits=delta_bits, wide=wide,
    )
    order = np.argsort(pos, kind="stable")
    np.testing.assert_array_equal(got_pos, pos[order])
    np.testing.assert_array_equal(got_sign, sign[order])
    np.testing.assert_array_equal(got_lid, lid[order])


def test_pack_occ_first_record_exception():
    # first position beyond 2^delta must come back exactly (it is
    # always an exception: delta from the implicit 0 origin)
    pos = np.array([1 << 20, (1 << 20) + 3], np.uint64)
    oi = np.array([5, -7], np.int32)
    got_pos, got_sign, got_lid = _roundtrip(
        pos, oi, cap=8, exc_cap=16, delta_bits=14
    )
    np.testing.assert_array_equal(got_pos, pos.astype(np.int64))
    np.testing.assert_array_equal(got_lid, [5, 7])
    np.testing.assert_array_equal(got_sign, [False, True])


def test_pack_spec_gates():
    # table too big for the minimum split -> None
    assert sortpipe._occ_pack_spec(1 << 21, 1 << 24, 1 << 28) is None
    # sparse occurrences -> None
    assert sortpipe._occ_pack_spec(1000, 100, 1 << 30) is None
    # dense, small table -> max split
    assert (
        sortpipe._occ_pack_spec(44_000, 2_200_000, 285_736_960)
        == sortpipe._OCC_MAX_DELTA_BITS
    )
    # big per-round table (5 Gbase scale) -> reduced delta bits
    s = sortpipe._occ_pack_spec(348_000, 3_000_000, 5 << 30)
    assert s is not None and 11 <= s < 14
