"""End-to-end distributed sort-join engine: FASTA in, .dbg out, over a
device mesh.

This assembles the per-step distributed pieces (parallel/sortshard.py
routing, passes/sortpipe.py record building and judging) into a complete
mesh-aware pipeline with the same contract as the single-device engines
— deterministic, byte-identical output. The reference has no distributed
layer at all (SURVEY.md §2.4); its closest analogue is the -r rounds
mechanism (vertexenumerator.h:176-211), which partitions hash space
across TIME — here the same hash-interval rounds compose with a k-mer
-range partition across SPACE (devices), so a round's records are spread
over D sorts of 1/D the size each.

Dataflow per round:
  1. every batch: build records on the data-parallel rows, gate by the
     round's hash interval, route by canonical-k-mer range (quantile
     boundaries measured from the input — GC bias makes a uniform word0
     split badly skewed) with one all_to_all, and append the received
     records into a per-device resident buffer;
  2. one per-device sort + segmented judge (all records of a k-mer live
     on exactly one device, so junction decisions are local);
  3. global junction ids = local rank + exclusive prefix over devices
     (one all_gather of D counts) — in device-major order these ARE the
     round-table row ranks, so the host-side multi-round merge + emit
     (sortpipe.merge_rounds_and_emit) is shared verbatim with the
     single-device engine.

Multi-host note: every collective here is a single mesh all_to_all /
all_gather / psum — under jax.distributed with a DCN+ICI mesh the same
program runs unchanged; see parallel/multihost.py for process setup and
per-host input sharding.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twopaco_tpu.io import fasta as fasta_io
from twopaco_tpu.io import windows
from twopaco_tpu.ops import pack
from twopaco_tpu.parallel.sortshard import SortShardConfig, _route_records
from twopaco_tpu.passes import kernels, sortpipe
from twopaco_tpu.passes.pipeline import (
    PipelineConfig,
    RunStats,
    _split_rounds,
)

U32 = jnp.uint32


@dataclass(frozen=True)
class DistConfig:
    """Shapes of the distributed engine (all compile-time static)."""

    base: kernels.PassConfig
    n_devices: int
    dev_slots: int  # per-device record buffer capacity
    route_cap: int  # per (src, dst) all_to_all block rows

    def __post_init__(self):
        assert self.base.B % self.n_devices == 0


@partial(jax.jit, static_argnames=("cfg", "bin_pow"))
def word0_histogram(codes, valid, *, cfg, bin_pow: int = 16):
    """Histogram of canonical k-mer word0 top bits over one batch — the
    measurement pass behind quantile-balanced routing boundaries."""
    _canonV, _pay, _hv, ok, _flat = sortpipe._batch_records(
        codes, valid, (jnp.uint32(0),), cfg
    )
    top = (_canonV[..., 0] >> (32 - bin_pow)).astype(jnp.int32).reshape(-1)
    okf = ok.reshape(-1)
    return jnp.zeros(1 << bin_pow, jnp.int32).at[
        jnp.where(okf, top, 0)
    ].add(okf.astype(jnp.int32))


def route_bounds_from_hist(
    hist: np.ndarray, n_devices: int, bin_pow: int = 16
) -> np.ndarray:
    """(D-1,) ascending uint32 word0 boundaries of ~equal record mass.

    Bucketing is owner = #{bounds < word0} (searchsorted side='left'),
    so device d owns word0 in (bounds[d-1], bounds[d]]. Ownership is a
    pure function of word0, so all records of one k-mer land on one
    device regardless of where boundaries fall."""
    D = n_devices
    total = int(hist.sum())
    csum = np.cumsum(hist)
    targets = (np.arange(1, D) * total) / D
    bins = np.searchsorted(csum, targets, side="left")
    shift = 32 - bin_pow
    bounds = ((bins + 1) << shift).astype(np.uint64)
    # strictly increasing even on degenerate histograms
    bounds = np.maximum.accumulate(bounds)
    bump = np.arange(D - 1, dtype=np.uint64)
    bounds = np.minimum(bounds + 0, (1 << 32) - (D - 1) + bump)
    for i in range(1, D - 1):
        if bounds[i] <= bounds[i - 1]:
            bounds[i] = bounds[i - 1] + 1
    return bounds.astype(np.uint32)


def _append_fn(buf, cnt, codes, valid, row0, low, high, bounds, *, dcfg):
    """shard_map body: one batch -> routed records appended to the local
    per-device buffer. buf (dev_slots, C) uint32, cnt (1,) int32."""
    cfg = dcfg.base
    D = dcfg.n_devices
    w = cfg.w
    local_rows = cfg.B // D
    my = jax.lax.axis_index("shard")
    r0 = row0 + (my * local_rows).astype(jnp.uint32)
    words, payload, pos = sortpipe.build_sort_records(
        codes, valid, (r0 * U32(cfg.P),), low, high, cfg=cfg
    )
    scfg = SortShardConfig(base=cfg, n_devices=D)
    send, over_route = _route_records(
        words, payload, pos[0], scfg, dcfg.route_cap, bounds=bounds
    )
    recv = jax.lax.all_to_all(
        send, "shard", split_axis=0, concat_axis=0, tiled=False
    ).reshape(-1, w + 2)  # (D*route_cap, C)

    # stable-compact real received records to the block front
    m = recv.shape[0]
    real = ((recv[:, w] >> 17) & U32(1)) > 0
    n_new = jnp.sum(real, dtype=jnp.int32)
    cols = jax.lax.sort(
        ((~real).astype(U32), jnp.arange(m, dtype=U32))
        + tuple(recv[:, i] for i in range(w + 2)),
        num_keys=2,
    )
    block = jnp.stack(cols[2:], axis=-1)
    live = jnp.arange(m, dtype=jnp.int32) < n_new
    block = jnp.where(
        live[:, None],
        block,
        jnp.concatenate(
            [jnp.full(w, sortpipe.SENTINEL_WORD, U32), jnp.zeros(2, U32)]
        ),
    )
    # fixed-size block write at the current fill; the sentinel tail is
    # overwritten by the next batch's block (or stays sentinel). An
    # out-of-bounds write would be clamped (corrupting earlier rows) —
    # detected here and raised on host before any result is used.
    over_buf = (cnt[0] + m > dcfg.dev_slots).astype(jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, block, (cnt[0], jnp.int32(0)))
    cnt = cnt + n_new
    overflow = jax.lax.psum(over_route + over_buf, "shard")
    return buf, cnt, overflow


def _finish_fn(buf, cnt, abundance, *, dcfg, check_abundance):
    """shard_map body: local sort + judge of the round's device block;
    ids made global by exclusive prefix of per-device junction counts."""
    cfg = dcfg.base
    w = cfg.w
    del cnt  # unfilled rows are sentinels already
    sw, pay, pos = sortpipe.sort_records(
        buf[:, :w] + U32(0), buf[:, w] + U32(0),
        (buf[:, w + 1] + U32(0),),
        w=w,
    )
    pos = pos[0]
    keep_first, keep, ids, _n_groups, n_junc, n_occ = (
        sortpipe.judge_records(
            sw, pay, abundance, check_abundance=check_abundance
        )
    )
    all_counts = jax.lax.all_gather(n_junc, "shard")  # (D,)
    my = jax.lax.axis_index("shard")
    offset = jnp.sum(
        jnp.where(
            jnp.arange(dcfg.n_devices) < my, all_counts, 0
        ),
        dtype=jnp.int64,
    )
    gids = jnp.where(
        ids != 0,
        jnp.sign(ids).astype(jnp.int64) * (jnp.abs(ids) + offset),
        0,
    ).astype(jnp.int64)
    return (
        sw,
        pos,
        keep_first,
        keep,
        gids,
        jax.lax.psum(n_junc, "shard"),
        jax.lax.psum(n_occ, "shard"),
    )


def _make_steps(mesh: Mesh, dcfg: DistConfig, check_abundance: bool):
    C = dcfg.base.w + 2
    shard = NamedSharding(mesh, P("shard"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(shard, shard))
    def init_bufs():
        buf = jnp.full(
            (dcfg.n_devices * dcfg.dev_slots, C), sortpipe.SENTINEL_WORD,
            U32,
        )
        buf = buf.at[:, dcfg.base.w :].set(U32(0))  # payload/pos lanes
        cnt = jnp.zeros(dcfg.n_devices, jnp.int32)
        return buf, cnt

    append = jax.jit(
        jax.shard_map(
            partial(_append_fn, dcfg=dcfg),
            mesh=mesh,
            in_specs=(
                P("shard"), P("shard"), P("shard"), P("shard"),
                P(), P(), P(), P(),
            ),
            out_specs=(P("shard"), P("shard"), P()),
        ),
        donate_argnums=(0, 1),
        in_shardings=(
            shard, shard, shard, shard, repl, repl, repl, repl,
        ),
    )
    finish = jax.jit(
        jax.shard_map(
            partial(
                _finish_fn, dcfg=dcfg, check_abundance=check_abundance
            ),
            mesh=mesh,
            in_specs=(P("shard"), P("shard"), P()),
            out_specs=(
                P("shard"), P("shard"), P("shard"), P("shard"),
                P("shard"), P(), P(),
            ),
        ),
        donate_argnums=(0,),
    )
    return init_bufs, append, finish


def build_junctions_dist(
    input_paths: Sequence[str] | None,
    config: PipelineConfig,
    mesh: Mesh | None = None,
    out_path: str | None = None,
    sequences: Sequence[tuple[int, np.ndarray]] | None = None,
    log: Callable[[str], None] = lambda s: None,
):
    """Mesh-parallel counterpart of sortpipe.build_junctions_sorted
    (same contract, byte-identical output)."""
    from twopaco_tpu.parallel.sharded import make_mesh

    if mesh is None:
        mesh = make_mesh()
    D = mesh.devices.size
    cfg = config.pass_config()
    if cfg.B % D:
        raise ValueError(
            f"rows_per_batch ({cfg.B}) must be a multiple of the mesh "
            f"size ({D})"
        )
    wcfg = config.window_config()
    stats = RunStats()
    t_start = time.time()

    if sequences is None:
        sequences = [
            (sid, codes)
            for sid, _hdr, codes in fasta_io.read_all_records(input_paths)
        ]
    batches = list(windows.iter_window_batches(iter(sequences), wcfg))
    stats.total_positions = sum(int(b.valid.sum()) for b in batches)
    n_slots = len(batches) * cfg.B * cfg.P
    if n_slots >= 1 << 32:
        raise ValueError(
            "distributed engine routes single-column u32 positions; "
            "inputs beyond ~4.2 Gbases need the single-device sort "
            "engine (wide positions) for now"
        )
    log(
        f"Engine = distributed sort-join over {D} devices\n"
        f"Vertex length = {config.k}\nRecord slots = {n_slots}"
    )

    from twopaco_tpu.parallel import multihost

    put = multihost.make_put(mesh)
    dev_batches = [
        (
            tuple(put(a) for a in pack.pack_codes_host(b.codes)),
            put(b.valid),
            b.row0,
        )
        for b in batches
    ]

    # measurement passes: round intervals (vertex-hash mass) + routing
    # boundaries (canonical word0 mass)
    bin_pow = 16
    whist = None
    hist = None
    for codes_d, valid_d, _r0 in dev_batches:
        wh = word0_histogram(codes_d, valid_d, cfg=cfg, bin_pow=bin_pow)
        whist = wh if whist is None else whist + wh
        if config.rounds > 1:
            h = kernels.histogram_vertex_hashes(
                codes_d, valid_d, cfg=cfg, bin_pow=bin_pow
            )
            hist = h if hist is None else hist + h
    bounds = route_bounds_from_hist(np.asarray(whist), D, bin_pow)
    bounds_d = jnp.asarray(bounds)
    intervals = (
        _split_rounds(np.asarray(hist), config.rounds, bin_pow)
        if config.rounds > 1
        else [(0, 0xFFFFFFFF)]
    )
    if len(intervals) > 1:
        log(f"Splitting the input kmers set ({len(intervals)} rounds)")

    # capacities: per-batch route blocks + per-round device buffers,
    # derated by round_slack for residual imbalance (overflow detected)
    per_batch_dev = (cfg.B // D) * cfg.P
    route_cap = min(
        per_batch_dev,
        ((int(per_batch_dev / D * config.round_slack) + 256 + 127) // 128)
        * 128,
    )
    block = D * route_cap
    exp_round_dev = n_slots / len(intervals) / D
    dev_slots = int(exp_round_dev * config.round_slack) + block
    dev_slots = ((dev_slots + 127) // 128) * 128
    dcfg = DistConfig(
        base=cfg, n_devices=D, dev_slots=dev_slots, route_cap=route_cap
    )
    check_ab = config.abundance < (1 << 64) - 1
    abundance_d = jnp.uint64(config.abundance)
    init_bufs, append, finish = _make_steps(mesh, dcfg, check_ab)

    round_tables: list[np.ndarray] = []
    round_occ: list[tuple[np.ndarray, np.ndarray]] = []
    for r, (low, high) in enumerate(intervals):
        log(f"Round {r}, {low}:{high}")
        t0 = time.time()
        buf, cnt = init_bufs()
        overflow = 0
        for codes_d, valid_d, row0 in dev_batches:
            buf, cnt, over = append(
                buf, cnt, codes_d, valid_d, jnp.uint32(row0),
                jnp.uint32(low), jnp.uint32(high), bounds_d,
            )
            overflow += int(over)
        if overflow:
            raise RuntimeError(
                f"distributed record buffer overflow ({overflow} "
                "routing/append drops) — raise PipelineConfig."
                "round_slack or rounds"
            )
        t_build = time.time() - t0

        t0 = time.time()
        sw, spos, keep_first, keep, gids, n_junc, n_occ = finish(
            buf, cnt, abundance_d
        )
        n_junc, n_occ = int(n_junc), int(n_occ)
        # host gather + compact (device-major order = global rank order)
        kf = multihost.fetch(keep_first)
        kp = multihost.fetch(keep)
        table = multihost.fetch(sw)[kf]
        op = multihost.fetch(spos)[kp]
        oi = multihost.fetch(gids)[kp]
        order = np.argsort(op, kind="stable")
        round_tables.append(table)
        round_occ.append((op[order], oi[order]))
        t_finish = time.time() - t0
        stats.rounds.append(
            dict(
                low=low,
                high=high,
                marks=n_occ,
                hash_table_size=0,
                true_junctions=n_junc,
                false_positives=0,
                t_build=t_build,
                t_finish=t_finish,
            )
        )
        log(
            f"Routed+appended\t{t_build:.1f}\nSort+judge\t{t_finish:.1f}\n"
            f"True junctions = {n_junc}\nOccurrences = {n_occ}"
        )
        assert len(table) == n_junc, (len(table), n_junc)

    del dev_batches
    return sortpipe.merge_rounds_and_emit(
        round_tables, round_occ, batches, cfg, config, out_path, stats,
        log, t_start,
    )
