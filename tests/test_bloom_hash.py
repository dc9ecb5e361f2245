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
