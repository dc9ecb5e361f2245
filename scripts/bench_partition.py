"""Microbench: per-batch record partitioning strategies on real TPU.

The grouped-resident 5 Gbase run spends ~1900 s in _partition_scan —
build_and_partition full-sorts all m=B*P records by part id (7 sorted
columns) per batch per group. Candidate replacements:

  sort7   — current: lax.sort (part, w words, payload, pos...) 1 key
  sort2   — lax.sort (part, iota) then gather the other columns
  scatter — per-part cumsum ranks, single row-scatter into the blocks

Run SOLO on the TPU: python scripts/bench_partition.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
SENTINEL = U32(0xFFFFFFFF)


def make_inputs(m, w, n_parts, key):
    ks = jax.random.split(key, 4)
    part = jax.random.randint(ks[0], (m,), 0, n_parts + 1).astype(U32)
    # ~ n_parts/(n_parts+1) live, like one group of a grouped run
    words = jax.random.bits(ks[1], (m, w), dtype=U32)
    pay = jax.random.bits(ks[2], (m,), dtype=U32)
    pos = jax.random.bits(ks[3], (m,), dtype=U32)
    return part, words, pay, pos


def sort7(part, words, pay, pos, *, n_parts, cap):
    w = words.shape[1]
    cols = jax.lax.sort(
        (part,) + tuple(words[:, i] for i in range(w)) + (pay, pos),
        num_keys=1,
    )
    partS = cols[0]
    wS = jnp.stack(cols[1 : 1 + w], axis=-1)
    payS, posS = cols[1 + w], cols[2 + w]
    counts = jnp.sum(
        partS[None, :] == jnp.arange(n_parts, dtype=U32)[:, None],
        axis=1, dtype=jnp.int32,
    )
    starts = jnp.cumsum(counts) - counts
    wS = jnp.concatenate([wS, jnp.full((cap, w), SENTINEL, U32)])
    payS = jnp.concatenate([payS, jnp.zeros(cap, U32)])
    posS = jnp.concatenate([posS, jnp.zeros(cap, U32)])
    live_i = jnp.arange(cap, dtype=jnp.int32)
    out_w, out_pay, out_pos = [], [], []
    for r in range(n_parts):
        live = live_i < counts[r]
        sw = jax.lax.dynamic_slice(wS, (starts[r], jnp.int32(0)), (cap, w))
        out_w.append(jnp.where(live[:, None], sw, SENTINEL))
        sp = jax.lax.dynamic_slice(payS, (starts[r],), (cap,))
        out_pay.append(jnp.where(live, sp, U32(0)))
        so = jax.lax.dynamic_slice(posS, (starts[r],), (cap,))
        out_pos.append(jnp.where(live, so, U32(0)))
    return jnp.stack(out_w), jnp.stack(out_pay), jnp.stack(out_pos), counts


def sort2(part, words, pay, pos, *, n_parts, cap):
    m = part.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    partS, idxS = jax.lax.sort((part, iota), num_keys=1)
    counts = jnp.sum(
        partS[None, :] == jnp.arange(n_parts, dtype=U32)[:, None],
        axis=1, dtype=jnp.int32,
    )
    starts = jnp.cumsum(counts) - counts
    idxS = jnp.concatenate([idxS, jnp.zeros(cap, jnp.int32)])
    live_i = jnp.arange(cap, dtype=jnp.int32)
    out_w, out_pay, out_pos = [], [], []
    for r in range(n_parts):
        live = live_i < counts[r]
        sl = jax.lax.dynamic_slice(idxS, (starts[r],), (cap,))
        out_w.append(
            jnp.where(live[:, None], words[sl], SENTINEL)
        )
        out_pay.append(jnp.where(live, pay[sl], U32(0)))
        out_pos.append(jnp.where(live, pos[sl], U32(0)))
    return jnp.stack(out_w), jnp.stack(out_pay), jnp.stack(out_pos), counts


def scatter(part, words, pay, pos, *, n_parts, cap):
    m = part.shape[0]
    w = words.shape[1]
    total = n_parts * cap
    iota = jnp.arange(m, dtype=jnp.int32)
    dst = jnp.full((m,), total, jnp.int32)
    counts = []
    for r in range(n_parts):
        mr = part == U32(r)
        rank = jnp.cumsum(mr.astype(jnp.int32)) - 1
        dst = jnp.where(mr & (rank < cap), r * cap + rank, dst)
        counts.append(jnp.sum(mr, dtype=jnp.int32))
    counts = jnp.stack(counts)
    # dropped rows need UNIQUE oob destinations for unique_indices=True
    dst = jnp.where(dst == total, total + iota, dst)
    ow = jnp.full((total, w), SENTINEL, U32).at[dst].set(
        words, mode="drop", unique_indices=True
    )
    op = jnp.zeros((total,), U32).at[dst].set(
        pay, mode="drop", unique_indices=True
    )
    oo = jnp.zeros((total,), U32).at[dst].set(
        pos, mode="drop", unique_indices=True
    )
    return (
        ow.reshape(n_parts, cap, w),
        op.reshape(n_parts, cap),
        oo.reshape(n_parts, cap),
        counts,
    )


def scatter_sparse(part, words, pay, pos, *, n_parts, cap):
    """Same as scatter, but part ids >= n_parts dominate (a grouped
    scan sees ~1/n_groups live rows): measures whether XLA scatter
    cost follows writes or indices."""
    return scatter(part, words, pay, pos, n_parts=n_parts, cap=cap)


def tilesort(part, words, pay, pos, *, n_parts, cap, tile=2048, tcap=512):
    """Two-level compaction: per-tile minor-axis sort pushes live rows
    to the front of each tile (vectorized independent sorts), slice
    tcap survivors per tile, then one small global sort + gathers."""
    m = part.shape[0]
    w = words.shape[1]
    nt = m // tile
    gidx = jnp.arange(m, dtype=jnp.int32)
    keyT = part.reshape(nt, tile)
    idxT = gidx.reshape(nt, tile)
    keyS, idxS = jax.lax.sort((keyT, idxT), dimension=1, num_keys=1)
    keyC = keyS[:, :tcap].reshape(-1)
    idxC = idxS[:, :tcap].reshape(-1)
    # per-tile overflow check: the tcap-th key must already be dead
    tile_over = jnp.sum(
        (keyS[:, tcap:tcap + 1] < U32(n_parts)).astype(jnp.int32)
    )
    mc = keyC.shape[0]
    iota = jnp.arange(mc, dtype=jnp.int32)
    keyG, idxG, ordG = jax.lax.sort((keyC, idxC, iota), num_keys=1)
    counts = jnp.sum(
        keyG[None, :] == jnp.arange(n_parts, dtype=U32)[:, None],
        axis=1, dtype=jnp.int32,
    )
    starts = jnp.cumsum(counts) - counts
    idxG = jnp.concatenate([idxG, jnp.zeros(cap, jnp.int32)])
    live_i = jnp.arange(cap, dtype=jnp.int32)
    out_w, out_pay, out_pos = [], [], []
    for r in range(n_parts):
        live = live_i < counts[r]
        sl = jax.lax.dynamic_slice(idxG, (starts[r],), (cap,))
        out_w.append(jnp.where(live[:, None], words[sl], SENTINEL))
        out_pay.append(jnp.where(live, pay[sl], U32(0)))
        out_pos.append(jnp.where(live, pos[sl], U32(0)))
    return (
        jnp.stack(out_w),
        jnp.stack(out_pay),
        jnp.stack(out_pos),
        counts + 0 * tile_over,
    )


def bench(fn, name, part, words, pay, pos, n_parts, cap, iters=20):
    jf = jax.jit(lambda a, b, c, d: fn(a, b, c, d, n_parts=n_parts, cap=cap))
    r = jf(part, words, pay, pos)
    jax.block_until_ready(r)
    # value-dependent fetch per iter so the dispatch can't be elided
    t0 = time.perf_counter()
    acc = 0
    for _ in range(iters):
        r = jf(part, words, pay, pos)
        acc += int(r[3][0])
    dt = (time.perf_counter() - t0) / iters
    m = part.shape[0]
    print(f"{name:8s} {dt*1e3:8.2f} ms/batch  {m/dt/1e6:9.1f} Mrow/s  (chk {acc})")
    return r


def main():
    m = 128 * 16384  # one (rows=128, P=16384) batch
    w = 2
    n_parts, cap = 4, 32768  # the 5 Gbase grouped-run shapes
    key = jax.random.PRNGKey(0)
    part, words, pay, pos = make_inputs(m, w, n_parts, key)
    print(f"m={m} w={w} n_parts={n_parts} cap={cap} "
          f"dev={jax.devices()[0]}")
    r7 = bench(sort7, "sort7", part, words, pay, pos, n_parts, cap)
    r2 = bench(sort2, "sort2", part, words, pay, pos, n_parts, cap)
    rs = bench(scatter, "scatter", part, words, pay, pos, n_parts, cap)
    # cross-check: same multiset per part (sort7 orders by words within
    # a part; sort2/scatter keep input order) and same counts
    c7, c2, cs = (np.asarray(r[3]) for r in (r7, r2, rs))
    np.testing.assert_array_equal(c7, c2)
    np.testing.assert_array_equal(c7, cs)
    for r in range(n_parts):
        a = np.sort(np.asarray(r7[1][r]))
        b = np.sort(np.asarray(r2[1][r]))
        c = np.sort(np.asarray(rs[1][r]))
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)
    print("payload multisets agree across strategies (dense)")

    # sparse case: a grouped scan sees ~1/n_groups live rows
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    part_sp = jnp.where(
        jax.random.uniform(ks[0], (m,)) < 0.05,
        jax.random.randint(ks[1], (m,), 0, n_parts).astype(U32),
        U32(n_parts),
    )
    rss = bench(
        scatter_sparse, "scat5%", part_sp, words, pay, pos, n_parts, cap
    )
    r2s = bench(sort2, "sort2-5%", part_sp, words, pay, pos, n_parts, cap)
    rts = bench(tilesort, "tile-5%", part_sp, words, pay, pos, n_parts, cap)
    c2s, css, cts = (np.asarray(r[3]) for r in (r2s, rss, rts))
    np.testing.assert_array_equal(c2s, css)
    np.testing.assert_array_equal(c2s, cts)
    for r in range(n_parts):
        a = np.sort(np.asarray(r2s[1][r]))
        np.testing.assert_array_equal(a, np.sort(np.asarray(rss[1][r])))
        np.testing.assert_array_equal(a, np.sort(np.asarray(rts[1][r])))
    print("payload multisets agree across strategies (sparse)")


if __name__ == "__main__":
    main()
