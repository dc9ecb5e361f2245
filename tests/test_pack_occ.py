"""Round-trip tests for the 4-byte packed occurrence fetch
(sortpipe._pack_occ / _unpack_occ): positions with large gaps go
through the exception table; packed+raw rounds must merge identically.
"""

import numpy as np
import pytest

from twopaco_tpu.passes import sortpipe


def _roundtrip(pos, oi, cap, exc_cap):
    import jax.numpy as jnp

    n = len(pos)
    pos_d = jnp.asarray(
        np.concatenate([pos, np.zeros(cap - n, np.uint32)])
    )
    oi_d = jnp.asarray(np.concatenate([oi, np.zeros(cap - n, np.int32)]))
    packed, exc_i, exc_p = sortpipe._pack_occ(
        pos_d, oi_d, jnp.uint32(n), exc_cap=exc_cap
    )
    return sortpipe._unpack_occ(
        np.asarray(packed)[:n], np.asarray(exc_i), np.asarray(exc_p)
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_occ_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    # mix of tiny deltas and huge jumps (every ~100th gap > 2^14)
    deltas = rng.integers(1, 200, size=n).astype(np.uint64)
    big = rng.random(n) < 0.01
    deltas[big] += rng.integers(
        1 << 14, 1 << 22, size=int(big.sum()), dtype=np.uint64
    )
    pos = np.cumsum(deltas).astype(np.uint32)
    assert int(pos[-1]) < (1 << 32)
    lid = rng.integers(1, 1 << 17, size=n).astype(np.int32)
    sign = rng.random(n) < 0.5
    oi = np.where(sign, -lid, lid).astype(np.int32)

    # feed shuffled (k-mer order), expect position-sorted back
    perm = rng.permutation(n)
    got_pos, got_sign, got_lid = _roundtrip(
        pos[perm], oi[perm], cap=8192, exc_cap=1024
    )
    order = np.argsort(pos, kind="stable")
    np.testing.assert_array_equal(got_pos, pos[order])
    np.testing.assert_array_equal(got_sign, sign[order])
    np.testing.assert_array_equal(got_lid, lid[order])


def test_pack_occ_first_record_exception():
    # first position beyond 2^14 must come back exactly (it is always
    # an exception: delta from the implicit 0 origin)
    pos = np.array([1 << 20, (1 << 20) + 3], np.uint32)
    oi = np.array([5, -7], np.int32)
    got_pos, got_sign, got_lid = _roundtrip(pos, oi, cap=8, exc_cap=16)
    np.testing.assert_array_equal(got_pos, pos)
    np.testing.assert_array_equal(got_lid, [5, 7])
    np.testing.assert_array_equal(got_sign, [False, True])
