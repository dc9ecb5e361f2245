"""Device packing ops vs the host numpy reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from twopaco_tpu import dna
from twopaco_tpu.ops import pack

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("k", [3, 5, 11, 15, 16 + 9, 31, 32 + 1, 63, 101])
def test_kmer_words_matches_numpy(k):
    L = 200
    codes = RNG.integers(0, 4, size=L).astype(np.uint8)
    n_out = L - k + 1
    got = np.asarray(pack.kmer_words(jnp.asarray(codes, jnp.uint32), k, n_out))
    kmers = np.stack([codes[i : i + k] for i in range(n_out)])
    want = dna.pack_kmers(kmers, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [3, 5, 15, 17, 25, 31, 33, 101])
def test_revcomp_words(k):
    n = 50
    kmers = RNG.integers(0, 4, size=(n, k)).astype(np.uint8)
    words = dna.pack_kmers(kmers, k)
    got = np.asarray(pack.revcomp_words(jnp.asarray(words), k))
    want = dna.revcomp_words(words, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [5, 25, 33])
def test_append_prepend(k):
    n = 40
    kmers = RNG.integers(0, 4, size=(n, k)).astype(np.uint8)
    c = RNG.integers(0, 4, size=n).astype(np.uint8)
    words = jnp.asarray(dna.pack_kmers(kmers, k))
    got_app = np.asarray(pack.append_char(words, k, jnp.asarray(c, jnp.uint32)))
    want_app = dna.pack_kmers(np.concatenate([kmers, c[:, None]], axis=1), k + 1)
    np.testing.assert_array_equal(got_app, want_app)
    got_pre = np.asarray(pack.prepend_char(words, k, jnp.asarray(c, jnp.uint32)))
    want_pre = dna.pack_kmers(np.concatenate([c[:, None], kmers], axis=1), k + 1)
    np.testing.assert_array_equal(got_pre, want_pre)


@pytest.mark.parametrize("k", [5, 25, 33])
def test_canonical_lexmin(k):
    n = 64
    kmers = RNG.integers(0, 4, size=(n, k)).astype(np.uint8)
    words = jnp.asarray(dna.pack_kmers(kmers, k))
    rc = pack.revcomp_words(words, k)
    canon, is_rc = pack.canonical(words, rc)
    canon, is_rc = np.asarray(canon), np.asarray(is_rc)
    for i in range(n):
        s = dna.decode(kmers[i])
        r = dna.revcomp_str(s)
        want = min(s, r)
        got = dna.decode(dna.unpack_kmers(canon[i], k)[0])
        assert got == want
        assert bool(is_rc[i]) == (r < s)


def test_window_all_definite():
    k = 5
    codes = np.array([0, 1, 2, 3, 0, 4, 1, 1, 2, 3, 0, 1, 2], dtype=np.uint8)
    n_out = len(codes) - k + 1
    got = np.asarray(pack.window_all_definite(jnp.asarray(codes), k, n_out))
    want = np.array(
        [all(codes[i : i + k] < 4) for i in range(n_out)], dtype=bool
    )
    np.testing.assert_array_equal(got, want)


def test_lex_less_eq():
    a = jnp.asarray([[1, 2], [3, 4], [3, 5]], jnp.uint32)
    b = jnp.asarray([[1, 3], [3, 4], [3, 4]], jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(pack.lex_less(a, b)), [True, False, False]
    )
    np.testing.assert_array_equal(
        np.asarray(pack.lex_eq(a, b)), [False, True, False]
    )


def test_transfer_pack_roundtrip():
    """pack_codes_host/unpack_codes must be lossless for codes 0..4 at
    any row length (including R not a multiple of 16 or 32)."""
    import numpy as np
    import jax.numpy as jnp
    from twopaco_tpu.ops import pack as p

    rng = np.random.default_rng(0)
    for R in (1, 15, 16, 17, 31, 32, 33, 130, 2048 + 26):
        codes = rng.integers(0, 5, size=(3, R)).astype(np.uint8)
        packed, nmask = p.pack_codes_host(codes)
        assert packed.dtype == np.uint32 and nmask.dtype == np.uint32
        out = np.asarray(p.unpack_codes(jnp.asarray(packed), jnp.asarray(nmask), R))
        np.testing.assert_array_equal(out, codes)
