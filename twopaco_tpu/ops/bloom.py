"""HBM-resident Bloom filter: functional fill (scatter) / probe (gather).

TPU-native replacement for the reference's atomic fetch_or bit array
(concurrentbitvector.cpp:31-37). Two layouts:

  - 'byte': one uint8 per Bloom slot. Fill is a plain scatter-max (all
    writes are 1, so it is order-independent and deterministic); probe is
    a byte gather. Simple and fast; 2^f bytes of HBM.
  - 'bit':  one uint32 word per 32 slots (8x denser, the reference's
    layout). There is no scatter-OR primitive, so fill is made
    deterministic and race-free by construction: sort the (word, bit)
    pairs, drop duplicates, OR each word's bits with a segmented sum of
    distinct powers of two, then scatter-assign the unique words. The
    sort also coalesces the memory traffic — random single-bit writes
    become mostly-sequential word updates.

Both are pure functions: fill returns the new filter array (donate the
argument under jit for in-place HBM update).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

U32 = jnp.uint32

BYTE_LAYOUT_MAX_F = 31  # 2 GiB of uint8 slots
BIT_LAYOUT_MAX_F = 35  # 4 GiB of bits; word index (2^30) must fit int32
# (f=36 would need 2^31 words — beyond int32 indexing and the fill
# sentinel scheme; shard across devices instead)


def choose_layout_slots(
    slots: int, byte_budget_bytes: int = 1 << 31
) -> str:
    """Pick a layout for a filter (shard) of `slots` Bloom slots."""
    if slots <= byte_budget_bytes and slots <= (1 << BYTE_LAYOUT_MAX_F):
        return "byte"
    if slots <= (1 << BIT_LAYOUT_MAX_F):
        return "bit"
    raise ValueError(
        f"Bloom filter of {slots} slots per device exceeds the "
        f"supported layouts (max 2^{BIT_LAYOUT_MAX_F} slots = 4 GiB of "
        "bits per device). Use --tpu-engine dist-bloom to shard the "
        "filter across a device mesh (each device then owns "
        "2^f/n_devices slots), spread it over more devices, or lower "
        "-f/--filtermemory. The default sort engine does not allocate "
        "a filter and accepts any -f."
    )


def choose_layout(f: int, byte_budget_bytes: int = 1 << 31) -> str:
    return choose_layout_slots(1 << f, byte_budget_bytes)


def make_filter(f: int, layout: str) -> jnp.ndarray:
    if layout == "byte":
        return jnp.zeros(1 << f, dtype=jnp.uint8)
    elif layout in ("bit", "block"):
        # block: same 2^(f-5) u32 words; slots are (vertex word, edge
        # bit) pairs instead of a flat f-bit index
        return jnp.zeros(1 << max(f - 5, 0), dtype=U32)
    raise ValueError(layout)


def fill(filt: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray, layout: str) -> jnp.ndarray:
    """Set Bloom slots idx (any shape) where valid; returns new filter."""
    idx = idx.reshape(-1)
    valid = valid.reshape(-1)
    if layout == "byte":
        safe = jnp.where(valid, idx, 0).astype(_index_dtype(filt.shape[0]))
        upd = valid.astype(jnp.uint8)
        return filt.at[safe].max(upd, mode="promise_in_bounds")
    return _fill_bits(filt, idx, valid)


def _index_dtype(n: int):
    """int32 whenever the array is addressable with it: 64-bit ints are
    software-emulated on TPU and bloat both compile and run time."""
    return jnp.int32 if n <= (1 << 31) else jnp.int64


def _fill_bits(filt: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    word = (idx >> 5).astype(jnp.int32)
    bit = (idx & 31).astype(jnp.int32)
    return _fill_word_bits(filt, word, bit, valid)


def _fill_word_bits(
    filt: jnp.ndarray, word: jnp.ndarray, bit: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Race-free OR of single bits into u32 words: sort the (word, bit)
    pairs, drop duplicates, segment-sum distinct powers of two, scatter
    the merged words. Shared by the 'bit' layout (word/bit derived from
    a flat slot index) and the 'block' layout (word = vertex hash, bit =
    edge hash — see fill_blocks)."""
    # invalid entries sort to the end and scatter out of bounds (dropped);
    # filt.shape[0] <= 2^30 (BIT_LAYOUT_MAX_F) so the sentinel is always
    # a valid int32 strictly above every real word index
    oob = jnp.int32(filt.shape[0])
    word = jnp.where(valid, word, oob)
    word, bit = jax.lax.sort((word, bit), num_keys=2)
    prev_word = jnp.concatenate([jnp.full(1, -1, jnp.int32), word[:-1]])
    prev_bit = jnp.concatenate([jnp.full(1, -1, jnp.int32), bit[:-1]])
    uniq = (word != prev_word) | (bit != prev_bit)
    new_word = word != prev_word
    seg = jnp.cumsum(new_word.astype(jnp.int32)) - 1
    m = word.shape[0]
    masks = jnp.where(uniq, U32(1) << bit.astype(U32), U32(0))
    or_mask = jax.ops.segment_sum(masks, seg, num_segments=m)  # distinct bits -> OR
    seg_word = jax.ops.segment_max(word, seg, num_segments=m)
    gather_word = jnp.clip(seg_word, 0, filt.shape[0] - 1)
    merged = filt[gather_word] | or_mask
    # Sentinel segments (invalid entries) and empty segments (segment_max
    # identity = int32 min) must not scatter. mode='drop' only drops
    # positive out-of-range indices (negatives wrap, numpy-style), so
    # redirect both cases to a positive out-of-range index.
    n = jnp.int32(filt.shape[0])
    bad = (seg_word >= n) | (seg_word < 0)
    seg_word = jnp.where(bad, n, seg_word)
    return filt.at[seg_word].set(merged, mode="drop")


def fill_blocks(
    filt: jnp.ndarray,
    word: jnp.ndarray,
    bit: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Vertex-blocked fill: set `bit` (..., q) in u32 `word` (...) where
    valid (...). word = f-5-bit slice of the strand-symmetric VERTEX
    hash of an edge endpoint; bit = in-word positions derived from the
    strand-symmetric EDGE hash. Because the word is keyed by the
    endpoint vertex, the mark pass tests all 8 edge extensions of a
    position with ONE word gather (probe_blocks) instead of 8 serial
    f-bit gathers — the XLA gather is ~serial per element on TPU, so
    this is the mark pass's 8x. Every real edge writes both in-range
    endpoints' words, so any probe the reference design guarantees to
    hit still hits (no false negatives; see kernels.fill_indices_block).
    """
    q = bit.shape[-1]
    word_q = jnp.broadcast_to(word[..., None], word.shape + (q,))
    valid_q = jnp.broadcast_to(valid[..., None], valid.shape + (q,))
    return _fill_word_bits(
        filt,
        word_q.reshape(-1).astype(jnp.int32),
        bit.reshape(-1).astype(jnp.int32),
        valid_q.reshape(-1),
    )


def probe_blocks(
    filt: jnp.ndarray, word: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Gather word (...) once, test mask (..., S): True where ALL of a
    slot's bits are present. mask combines the q in-word bits of one
    edge (block_mask)."""
    wv = filt[word.astype(jnp.int32)]
    return (wv[..., None] & mask) == mask


def block_word(hv: jnp.ndarray, f: int) -> jnp.ndarray:
    """Word index of a vertex: low f-5 bits of the symmetric hash (the
    filter has 2^(f-5) u32 words = 2^f bloom bits, same HBM as 'bit')."""
    return (hv & U32((1 << max(f - 5, 0)) - 1)).astype(jnp.int32)


def block_bits(e1: jnp.ndarray, e2: jnp.ndarray, q: int) -> jnp.ndarray:
    """q distinct in-word bit positions from the symmetric edge hash:
    (e1 + j*(e2|1)) mod 32 — the odd multiplier makes j*(e2|1) distinct
    mod 32 for j < 32, so a slot always tests exactly q bits."""
    h2 = e2 | U32(1)
    return jnp.stack(
        [((e1 + U32(j) * h2) & U32(31)) for j in range(q)], axis=-1
    )


def block_mask(e1: jnp.ndarray, e2: jnp.ndarray, q: int) -> jnp.ndarray:
    """OR of the q bit positions as a u32 mask (probe side)."""
    h2 = e2 | U32(1)
    m = jnp.zeros_like(e1)
    for j in range(q):
        m = m | (U32(1) << ((e1 + U32(j) * h2) & U32(31)))
    return m


def probe(filt: jnp.ndarray, idx: jnp.ndarray, layout: str) -> jnp.ndarray:
    """Test Bloom slots; True where the bit is set. idx any shape."""
    if layout == "byte":
        return filt[idx.astype(_index_dtype(filt.shape[0]))] > 0
    word = (idx >> 5).astype(jnp.int32)
    bit = (idx & 31).astype(U32)
    return ((filt[word] >> bit) & U32(1)) > 0


def probe_all(filt: jnp.ndarray, idx_q: jnp.ndarray, layout: str) -> jnp.ndarray:
    """AND of q probes along the last axis: (..., q) -> (...)."""
    return jnp.all(probe(filt, idx_q, layout), axis=-1)
