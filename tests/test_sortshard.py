"""Distributed sort-join step vs the single-device sort engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twopaco_tpu import dna
from twopaco_tpu.io import windows
from twopaco_tpu.parallel.sharded import make_mesh
from twopaco_tpu.parallel.sortshard import SortShardConfig, sharded_sort_step
from twopaco_tpu.passes import kernels, sortpipe
from twopaco_tpu.testing import oracle


def test_sharded_sort_step_matches_single_device():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    k = 9
    cfg = kernels.PassConfig(
        k=k, positions_per_row=128, rows_per_batch=8
    )
    scfg = SortShardConfig(base=cfg, n_devices=8)
    wcfg = windows.WindowConfig(k=k, positions_per_row=128, rows_per_batch=8)
    rng = np.random.default_rng(2024)
    base = oracle.generate_sequence(rng, 900)
    seqs = [(0, dna.encode(base)), (1, dna.encode(
        oracle.mutate_sequence(rng, base, 0.05, 0.1)))]
    b = next(windows.iter_window_batches(iter(seqs), wcfg))
    low, high = jnp.uint32(0), jnp.uint32(0xFFFFFFFF)
    ab = jnp.uint64((1 << 64) - 1)

    # single-device ground truth
    words, payload, pos = sortpipe.build_sort_records(
        jnp.asarray(b.codes), jnp.asarray(b.valid), (jnp.uint32(0),),
        low, high,
        cfg=cfg,
    )
    sw1, pay1, pos1 = sortpipe.sort_records(
        words.copy(), payload.copy(), tuple(p.copy() for p in pos),
        w=cfg.w,
    )
    pos1 = pos1[0]
    kf1, keep1, ids1, _g1, nj1, no1 = sortpipe.judge_records(
        sw1, pay1, ab, check_abundance=False
    )
    table1 = np.asarray(sw1)[np.asarray(kf1)]
    occ1 = {
        (int(p), int(i))
        for p, i in zip(
            np.asarray(pos1)[np.asarray(keep1)],
            np.asarray(ids1)[np.asarray(keep1)],
        )
    }

    # distributed step
    step = sharded_sort_step(mesh, scfg)
    sw, spos, kf, gids, nj, no, overflow = step(
        jnp.asarray(b.codes), jnp.asarray(b.valid), low, high, ab
    )
    assert int(overflow) == 0
    assert int(nj) == int(nj1)
    assert int(no) == int(no1)
    kf = np.asarray(kf)
    # device blocks concatenate into the globally sorted dictionary
    table = np.asarray(sw)[kf]
    np.testing.assert_array_equal(table, table1)
    gids = np.asarray(gids)
    occ = {
        (int(p), int(i))
        for p, i in zip(np.asarray(spos)[gids != 0], gids[gids != 0])
    }
    assert occ == occ1