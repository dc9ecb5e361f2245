"""Distributed sort-join: the flagship engine over a device mesh.

Records are routed by the TOP BITS OF THE FIRST K-MER WORD — i.e. by
lexicographic k-mer range — so device d owns a contiguous slice of
k-mer space. Consequences:

  - each device's locally sorted record block is a contiguous piece of
    the global sort order: the per-device junction tables concatenate
    (in device order) into the globally sorted dictionary;
  - global junction ids = local rank + exclusive prefix of per-device
    junction counts (one all_gather of D scalars);
  - occurrences are judged entirely locally after one all_to_all.

The exchange is the same dense bucketing used by the sharded Bloom
filter (parallel/sharded.py): static per-destination capacity with
overflow *detected*, columns stacked so one all_to_all moves the whole
record. This is the multi-chip analogue of the single-chip sort engine
(passes/sortpipe.py); the reference has no distributed layer at all
(SURVEY.md §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from twopaco_tpu.passes import kernels, sortpipe

U32 = jnp.uint32


@dataclass(frozen=True)
class SortShardConfig:
    base: kernels.PassConfig
    n_devices: int
    slack: float = 2.0  # record routing is content-skewed; be generous

    def __post_init__(self):
        assert self.base.B % self.n_devices == 0

    def cap(self) -> int:
        per_dev_records = (self.base.B // self.n_devices) * self.base.P
        c = int(per_dev_records / self.n_devices * self.slack) + 256
        return ((c + 127) // 128) * 128


def _route_records(
    words, payload, pos, scfg: SortShardConfig, cap: int, bounds=None
):
    """Bucket records by k-mer-prefix owner; returns (send (D, cap, C),
    overflow) where C = w + 1 + len(pos) stacked uint32 columns (pos is
    a tuple of 1 — narrow — or 2 — wide u32-pair — position columns).

    bounds: optional (D-1,) ascending uint32 quantile boundaries on
    word0 (from a word-prefix histogram of the actual input) — device d
    owns word0 in (bounds[d-1], bounds[d]]. Without bounds, ownership is
    a uniform split of word0 space, which skews on biased genomes (GC
    content concentrates the first 16 chars)."""
    D = scfg.n_devices
    m = words.shape[0]
    w = words.shape[1]
    real = ((payload >> 17) & U32(1)) > 0
    if bounds is None:
        # owner = top bits of word0 scaled to D (any D, contiguous ranges)
        owner = (
            (words[:, 0].astype(jnp.uint64) * jnp.uint64(D)) >> 32
        ).astype(jnp.int32)
    else:
        owner = jnp.searchsorted(
            bounds, words[:, 0], side="left"
        ).astype(jnp.int32)
    owner = jnp.where(real, owner, D)
    order = jnp.argsort(owner, stable=True)
    o_s = owner[order]
    counts = jax.ops.segment_sum(
        jnp.ones(m, jnp.int32), o_s, num_segments=D + 1
    )
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    slot = jnp.arange(m, dtype=jnp.int32) - offsets[o_s]
    ok = (slot < cap) & (o_s < D)
    overflow = jnp.sum((slot >= cap) & (o_s < D), dtype=jnp.int32)

    cols = jnp.concatenate(
        [words, payload[:, None]] + [p[:, None] for p in pos], axis=1
    )
    C = cols.shape[1]
    cols_s = cols[order]
    send = jnp.full((D, cap, C), sortpipe.SENTINEL_WORD, U32)
    # sentinel payload must read as not-real: clear everything but words
    send = send.at[:, :, w:].set(U32(0))
    send = send.at[
        jnp.where(ok, o_s, D), jnp.where(ok, slot, 0)
    ].set(cols_s, mode="drop")
    return send, overflow


def _local_sort_judge(recv, scfg: SortShardConfig, abundance, check_abundance):
    """recv (n, C) routed records -> judged local block. Each k-mer group
    lives entirely on one device (k-mer-range ownership), so the
    abundance threshold is exact when applied locally."""
    w = scfg.base.w
    n_pos = recv.shape[1] - w - 1
    words = recv[:, :w]
    payload = recv[:, w]
    pos = tuple(recv[:, w + 1 + c] for c in range(n_pos))
    sw, pay, spos = sortpipe.sort_records(
        words + U32(0), payload + U32(0),
        tuple(p + U32(0) for p in pos), w=w,
    )
    spos = spos[0] if n_pos == 1 else spos
    keep_first, keep, ids, n_groups, n_junc, n_occ = sortpipe.judge_records(
        sw, pay, abundance, check_abundance=check_abundance
    )
    return sw, spos, keep_first, keep, ids, n_junc, n_occ


def _step_fn(
    codes, valid, low, high, abundance,
    *, scfg: SortShardConfig, cap: int, check_abundance: bool,
):
    cfg = scfg.base
    local_rows = cfg.B // scfg.n_devices
    row0 = (jax.lax.axis_index("shard") * local_rows).astype(jnp.uint32)
    words, payload, pos = sortpipe.build_sort_records(
        codes, valid, (row0 * U32(cfg.P),), low, high, cfg=cfg
    )
    send, overflow = _route_records(words, payload, pos, scfg, cap)
    recv = jax.lax.all_to_all(
        send, "shard", split_axis=0, concat_axis=0, tiled=False
    ).reshape(-1, cfg.w + 1 + len(pos))
    sw, spos, keep_first, keep, ids, n_junc, n_occ = _local_sort_judge(
        recv, scfg, abundance, check_abundance
    )
    # globally consistent ids: exclusive prefix of per-device counts
    all_counts = jax.lax.all_gather(n_junc, "shard")  # (D,)
    my = jax.lax.axis_index("shard")
    offset = jnp.sum(
        jnp.where(jnp.arange(scfg.n_devices) < my, all_counts, 0),
        dtype=jnp.int64,
    )
    gids = jnp.where(
        ids != 0,
        jnp.sign(ids).astype(jnp.int64) * (jnp.abs(ids) + offset),
        0,
    )
    return (
        sw,
        spos,
        keep_first,
        gids,
        jax.lax.psum(n_junc, "shard"),
        jax.lax.psum(n_occ, "shard"),
        jax.lax.psum(overflow, "shard"),
    )


def sharded_sort_step(
    mesh: Mesh, scfg: SortShardConfig, check_abundance: bool = False
):
    """Jitted full distributed step: (codes, valid, low, high, abundance)
    -> (sorted words, positions, keep_first, global ids, n_junc, n_occ,
    overflow). Rows data-parallel in, k-mer-range-sharded out."""
    fn = jax.shard_map(
        partial(
            _step_fn, scfg=scfg, cap=scfg.cap(),
            check_abundance=check_abundance,
        ),
        mesh=mesh,
        in_specs=(P("shard"), P("shard"), P(), P(), P()),
        out_specs=(
            P("shard"),
            P("shard"),
            P("shard"),
            P("shard"),
            P(),
            P(),
            P(),
        ),
    )
    return jax.jit(fn)
