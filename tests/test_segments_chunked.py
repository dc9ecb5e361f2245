"""Chunked segmented reductions == monolithic versions."""

import numpy as np
import jax.numpy as jnp
import pytest

from twopaco_tpu.ops import segments as sg

RNG = np.random.default_rng(23)


def _mk(m, avg_seg):
    ng = np.zeros(m, bool)
    ng[0] = True
    ng[RNG.random(m) < 1.0 / avg_seg] = True
    ng[0] = True
    x1 = RNG.integers(0, 2**32, size=m, dtype=np.uint32)
    x2 = RNG.integers(0, 3, size=m).astype(np.uint32)  # small counters
    x2 = x2 | (RNG.integers(0, 3, size=m).astype(np.uint32) << 16)
    return jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(ng)


@pytest.mark.parametrize("avg_seg", [1.5, 8, 300, 100000])
def test_chunked_matches_monolithic(avg_seg):
    m, chunk = 4096, 512
    x1, x2, ng = _mk(m, avg_seg)
    want_or = sg.seg_reduce_broadcast(x1, ng, jnp.bitwise_or)
    want_sat = sg.seg_reduce_broadcast(x2, ng, sg._satadd_u16x2)
    got_or, got_sat = sg.seg_reduce_broadcast_chunked(
        (x1, x2), ng, ("or", "satadd_u16x2"), chunk
    )
    np.testing.assert_array_equal(np.asarray(got_or), np.asarray(want_or))
    np.testing.assert_array_equal(np.asarray(got_sat), np.asarray(want_sat))


def test_chunked_single_chunk_path():
    x1, x2, ng = _mk(512, 10)
    want = sg.seg_reduce_broadcast(x1, ng, jnp.bitwise_or)
    (got,) = sg.seg_reduce_broadcast_chunked((x1,), ng, ("or",), 512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_segment_spanning_many_chunks():
    m, chunk = 2048, 256
    ng = np.zeros(m, bool)
    ng[0] = True
    ng[1900] = True  # one giant segment + one tail segment
    x = jnp.asarray(RNG.integers(0, 2**32, size=m, dtype=np.uint32))
    want = sg.seg_reduce_broadcast(x, jnp.asarray(ng), jnp.bitwise_or)
    (got,) = sg.seg_reduce_broadcast_chunked(
        (x,), jnp.asarray(ng), ("or",), chunk
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cumsum_chunked():
    x = jnp.asarray(RNG.integers(0, 100, size=4096).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(sg.cumsum_chunked(x, 512)), np.asarray(jnp.cumsum(x))
    )
