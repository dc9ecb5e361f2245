"""Deterministic hashing of packed k-mers (murmur3-style, pure jnp).

Replaces the reference's q independent /dev/urandom-seeded Buzhash
functions (vertexrollinghash.h:13-52, characterhash.h:40-54) with a
fixed-seed multiply-xor mixer over the packed words plus
Kirsch–Mitzenmacher double hashing: q Bloom probe indices are derived
from two (or, for f > 32, four) 32-bit hashes instead of q full hash
evaluations — q-fold less hash math per edge than the reference, with
the same Bloom false-positive guarantees. Runs are bit-reproducible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
U64 = jnp.uint64

_C1 = 0xCC9E2D51
_C2 = 0x1B873593

# Fixed role seeds (arbitrary but frozen: changing them changes ids of
# nothing — ids come from sorted canonical k-mers — only Bloom bits).
SEED_VERTEX = 0x9E3779B9
SEED_EDGE_LO_1 = 0x85EBCA6B
SEED_EDGE_LO_2 = 0xC2B2AE35
SEED_EDGE_HI_1 = 0x27D4EB2F
SEED_EDGE_HI_2 = 0x165667B1
SEED_SHARD = 0xB5297A4D


def _rotl32(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << r) | (x >> (32 - r))


def mix32(words: jnp.ndarray, seed: int) -> jnp.ndarray:
    """murmur3_x86_32 over the word axis (last axis) -> uint32 (...)."""
    w = words.shape[-1]
    h = jnp.full(words.shape[:-1], seed, dtype=U32)
    for m in range(w):
        kx = words[..., m].astype(U32) * U32(_C1)
        kx = _rotl32(kx, 15)
        kx = kx * U32(_C2)
        h = h ^ kx
        h = _rotl32(h, 13)
        h = h * U32(5) + U32(0xE6546B64)
    h = h ^ U32(4 * w)
    h = h ^ (h >> 16)
    h = h * U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def vertex_hash(canon_words: jnp.ndarray) -> jnp.ndarray:
    """Canonical-vertex hash, uint32: the multi-round partition key
    (reference analogue: GetVertexHash / min(posHash0, negHash0),
    vertexrollinghash.h:137-142, but over [0, 2^32) not [0, 2^f))."""
    return mix32(canon_words, SEED_VERTEX)


def bloom_indices(canon_edge_words: jnp.ndarray, q: int, f: int) -> jnp.ndarray:
    """q Bloom bit indices in [0, 2^f) for canonical edges (..., w).

    Returns (..., q) uint32 when f <= 32, else uint64.
    """
    h1 = mix32(canon_edge_words, SEED_EDGE_LO_1)
    h2 = mix32(canon_edge_words, SEED_EDGE_LO_2) | U32(1)  # odd stride
    if f <= 32:
        mask = U32((1 << f) - 1 if f < 32 else 0xFFFFFFFF)
        idx = [(h1 + U32(j) * h2) & mask for j in range(q)]
    else:
        hh1 = mix32(canon_edge_words, SEED_EDGE_HI_1)
        hh2 = mix32(canon_edge_words, SEED_EDGE_HI_2)
        H1 = (hh1.astype(U64) << 32) | h1.astype(U64)
        H2 = ((hh2.astype(U64) << 32) | h2.astype(U64)) | U64(1)
        mask = U64((1 << f) - 1)
        idx = [(H1 + U64(j) * H2) & mask for j in range(q)]
    return jnp.stack(idx, axis=-1)


def mix32_np(words: np.ndarray, seed: int) -> np.ndarray:
    """Host/numpy twin of mix32 (for tests and host-side round splits)."""
    words = np.asarray(words, dtype=np.uint32)
    w = words.shape[-1]
    with np.errstate(over="ignore"):
        h = np.full(words.shape[:-1], seed, dtype=np.uint32)
        for m in range(w):
            kx = words[..., m] * np.uint32(_C1)
            kx = (kx << np.uint32(15)) | (kx >> np.uint32(17))
            kx = kx * np.uint32(_C2)
            h = h ^ kx
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(4 * w)
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h
