"""Bloom fill/probe determinism (both layouts)."""

import numpy as np
import jax.numpy as jnp
import pytest

from twopaco_tpu.ops import bloom

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("layout", ["byte", "bit"])
def test_bloom_fill_probe(layout):
    f = 16
    filt = bloom.make_filter(f, layout)
    idx = jnp.asarray(
        RNG.integers(0, 1 << f, size=4096, dtype=np.uint64).astype(np.uint32)
    )
    valid = jnp.asarray(RNG.random(4096) < 0.7)
    filt = bloom.fill(filt, idx, valid, layout)

    hits = np.asarray(bloom.probe(filt, idx, layout))
    v = np.asarray(valid)
    # every valid inserted index must probe positive
    assert hits[v].all()

    # negative control: indices never inserted probe negative
    # (build ground-truth set to avoid false-positive flakes)
    inserted = set(np.asarray(idx)[v].tolist())
    other = np.asarray(
        [i for i in range(1 << f) if i not in inserted][:2000], dtype=np.uint32
    )
    miss = np.asarray(bloom.probe(filt, jnp.asarray(other), layout))
    assert not miss.any()


@pytest.mark.parametrize("layout", ["byte", "bit"])
def test_bloom_fill_deterministic_and_idempotent(layout):
    f = 12
    idx = jnp.asarray(RNG.integers(0, 1 << f, size=512, dtype=np.uint32))
    valid = jnp.ones(512, dtype=bool)
    f1 = bloom.fill(bloom.make_filter(f, layout), idx, valid, layout)
    f2 = bloom.fill(bloom.make_filter(f, layout), idx, valid, layout)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    f3 = bloom.fill(f1, idx, valid, layout)  # re-insert: no change
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f3))


def test_bit_layout_matches_byte_layout():
    f = 14
    idx = jnp.asarray(RNG.integers(0, 1 << f, size=3000, dtype=np.uint32))
    valid = jnp.asarray(RNG.random(3000) < 0.5)
    fb = bloom.fill(bloom.make_filter(f, "byte"), idx, valid, "byte")
    fbit = bloom.fill(bloom.make_filter(f, "bit"), idx, valid, "bit")
    allidx = jnp.arange(1 << f, dtype=jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(bloom.probe(fb, allidx, "byte")),
        np.asarray(bloom.probe(fbit, allidx, "bit")),
    )


def test_byte_layout_f31_traces():
    """f=31 (BYTE_LAYOUT_MAX_F) is exactly 2^31 slots: int32 indexing
    overflows at TRACE time (jax must hold the size as an index-dtype
    constant), which broke `-f 31` on the byte layout. Trace-only via
    eval_shape — no 2 GB allocation."""
    import jax

    f = 31
    filt = jax.ShapeDtypeStruct((1 << f,), jnp.uint8)
    idx = jax.ShapeDtypeStruct((1024,), jnp.uint32)
    valid = jax.ShapeDtypeStruct((1024,), jnp.bool_)
    out = jax.eval_shape(
        lambda ft, ix, v: bloom.fill(ft, ix, v, "byte"), filt, idx, valid
    )
    assert out.shape == (1 << f,)
    hits = jax.eval_shape(
        lambda ft, ix: bloom.probe(ft, ix, "byte"), filt, idx
    )
    assert hits.shape == (1024,)
