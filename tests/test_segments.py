"""Scan-based segmented reductions vs jax.ops.segment_* ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from twopaco_tpu.ops import segments as sg

RNG = np.random.default_rng(17)


def _setup(m=1000, n_groups=137):
    seg_sizes = RNG.multinomial(m - n_groups, np.ones(n_groups) / n_groups) + 1
    seg_ids = np.repeat(np.arange(n_groups), seg_sizes)
    m = len(seg_ids)
    new_group = np.zeros(m, bool)
    new_group[0] = True
    new_group[1:] = seg_ids[1:] != seg_ids[:-1]
    x = RNG.integers(0, 100, size=m).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(new_group), seg_ids


def test_seg_sum():
    x, ng, sid = _setup()
    got = np.asarray(sg.seg_sum(x, ng))
    want = np.asarray(
        jax.ops.segment_sum(x, jnp.asarray(sid), num_segments=sid.max() + 1)
    )[sid]
    np.testing.assert_array_equal(got, want)


def test_seg_max():
    x, ng, sid = _setup()
    got = np.asarray(sg.seg_max(x, ng))
    want = np.asarray(
        jax.ops.segment_max(x, jnp.asarray(sid), num_segments=sid.max() + 1)
    )[sid]
    np.testing.assert_array_equal(got, want)


def test_seg_or():
    x, ng, sid = _setup()
    b = (np.asarray(x) % 7 == 0)
    got = np.asarray(sg.seg_or(jnp.asarray(b), ng))
    want = np.asarray(
        jax.ops.segment_max(
            jnp.asarray(b.astype(np.int32)),
            jnp.asarray(sid),
            num_segments=sid.max() + 1,
        )
    )[sid].astype(bool)
    np.testing.assert_array_equal(got, want)


def test_single_and_full_group():
    x = jnp.asarray([5, 3, 9], jnp.int32)
    ng = jnp.asarray([True, False, False])
    np.testing.assert_array_equal(np.asarray(sg.seg_sum(x, ng)), [17, 17, 17])
    ng2 = jnp.asarray([True, True, True])
    np.testing.assert_array_equal(np.asarray(sg.seg_sum(x, ng2)), [5, 3, 9])
