"""Scan-based rolling hash: identities vs direct evaluation."""

import numpy as np
import jax.numpy as jnp
import pytest

from twopaco_tpu import dna
from twopaco_tpu.ops import buzhash as bz

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("n", [3, 25, 64, 101])
def test_window_hashes_match_direct(n):
    L = 200
    codes = RNG.integers(0, 4, size=L).astype(np.uint8)
    s_f, s_r = bz.hash_scans(jnp.asarray(codes), bz.TABLE_1)
    n_out = L - n + 1
    hf, hr = bz.window_hashes(s_f, s_r, n, n_out)
    hf, hr = np.asarray(hf), np.asarray(hr)
    for p in range(0, n_out, 7):
        want_f = bz.window_hash_ref(codes[p : p + n], bz.TABLE_1)
        assert int(hf[p]) == want_f, p
        rc = (3 - codes[p : p + n])[::-1]
        want_r = bz.window_hash_ref(rc, bz.TABLE_1)
        assert int(hr[p]) == want_r, p


def test_append_prepend_identities():
    k = 25
    L = 100
    codes = RNG.integers(0, 4, size=L).astype(np.uint8)
    s_f, s_r = bz.hash_scans(jnp.asarray(codes), bz.TABLE_2)
    n_out = L - k
    hf_k, hr_k = bz.window_hashes(s_f, s_r, k, n_out)
    hf_k1, hr_k1 = bz.window_hashes(s_f, s_r, k + 1, n_out)
    hf_k, hf_k1 = np.asarray(hf_k), np.asarray(hf_k1)
    # the (k+1)-window at p IS the k-window at p with codes[p+k] appended,
    # and also the k-window at p+1 with codes[p] prepended
    hf_k_next = np.asarray(bz.window_hashes(s_f, s_r, k, L - k + 1)[0])
    for p in range(0, n_out, 5):
        c_app = int(codes[p + k])
        got = np.asarray(
            bz.append_hash(jnp.asarray(hf_k[p]), bz.TABLE_2, c_app)
        )
        assert int(got) == int(hf_k1[p])
        c_pre = int(codes[p])
        got2 = np.asarray(
            bz.prepend_hash(jnp.asarray(hf_k_next[p + 1]), bz.TABLE_2, c_pre, k)
        )
        assert int(got2) == int(hf_k1[p])


def test_strand_symmetry():
    """h_fwd(rc(W)) must equal h_rc(W): the '+'-combined value is then
    identical for a window and its reverse complement."""
    k = 11
    codes = RNG.integers(0, 4, size=60).astype(np.uint8)
    s_f, s_r = bz.hash_scans(jnp.asarray(codes), bz.TABLE_1)
    hf, hr = bz.window_hashes(s_f, s_r, k, 60 - k + 1)
    for p in range(0, 40, 3):
        w = codes[p : p + k]
        rc = (3 - w)[::-1]
        assert bz.window_hash_ref(rc, bz.TABLE_1) == int(np.asarray(hr)[p])
        sym1 = (int(np.asarray(hf)[p]) + int(np.asarray(hr)[p])) % (1 << 32)
        # compute the same for the rc window placed directly
        s2_f, s2_r = bz.hash_scans(jnp.asarray(rc), bz.TABLE_1)
        h2f, h2r = bz.window_hashes(s2_f, s2_r, k, 1)
        sym2 = (int(np.asarray(h2f)[0]) + int(np.asarray(h2r)[0])) % (1 << 32)
        assert sym1 == sym2
