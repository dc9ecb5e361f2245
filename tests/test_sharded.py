"""Multi-device sharded filter: equivalence with the single-device path
on an 8-virtual-device CPU mesh (SURVEY.md §4: the reference has no
distributed machinery; ours must be introduced and tested this way)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twopaco_tpu import dna
from twopaco_tpu.io import windows
from twopaco_tpu.ops import bloom
from twopaco_tpu.parallel import (
    ShardedConfig,
    make_mesh,
    make_sharded_filter,
    sharded_fill_step,
    sharded_mark_step,
)
from twopaco_tpu.passes import kernels
from twopaco_tpu.testing import oracle


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    return make_mesh(8)


@pytest.mark.parametrize("layout", ["byte", "bit"])
def test_sharded_equals_single_device(mesh, layout):
    k = 9
    cfg = kernels.PassConfig(
        k=k, q=3, f=18, layout=layout, positions_per_row=128, rows_per_batch=8
    )
    scfg = ShardedConfig(base=cfg, n_devices=8)
    wcfg = windows.WindowConfig(
        k=k, positions_per_row=128, rows_per_batch=8
    )
    rng = np.random.default_rng(42)
    seqs = [
        (i, dna.encode(oracle.generate_sequence(rng, 700))) for i in range(4)
    ]
    batches = list(windows.iter_window_batches(iter(seqs), wcfg))
    low, high = jnp.uint32(0), jnp.uint32(0xFFFFFFFF)

    # single-device reference result
    filt1 = bloom.make_filter(cfg.f, cfg.layout)
    for b in batches:
        filt1 = kernels.pass1_fill(
            filt1, jnp.asarray(b.codes), jnp.asarray(b.valid), low, high, cfg=cfg
        )
    masks1 = [
        np.asarray(
            kernels.pass2_mark(
                filt1, jnp.asarray(b.codes), jnp.asarray(b.valid), low, high,
                cfg=cfg,
            )[0]
        )
        for b in batches
    ]

    # sharded result
    fill = sharded_fill_step(mesh, scfg)
    mark = sharded_mark_step(mesh, scfg)
    filt = make_sharded_filter(mesh, scfg)
    for b in batches:
        filt, overflow = fill(
            filt, jnp.asarray(b.codes), jnp.asarray(b.valid), low, high
        )
        assert int(overflow) == 0
    if layout == "byte":
        # remap: global slot i lives at owner (i % D) local (i // D)
        D, S = scfg.n_devices, scfg.local_slots
        single = np.asarray(filt1)
        sharded_arr = np.asarray(filt)
        i = np.arange(1 << cfg.f)
        np.testing.assert_array_equal(
            sharded_arr[(i % D) * S + i // D], single[i]
        )
    for b, m1 in zip(batches, masks1):
        mask, count, overflow = mark(
            filt, jnp.asarray(b.codes), jnp.asarray(b.valid), low, high
        )
        assert int(overflow) == 0
        np.testing.assert_array_equal(np.asarray(mask), m1)
        assert int(count) == int(np.unpackbits(m1).sum())


def test_bucket_routing_and_overflow():
    """_bucket: dense owner bucketing is exact; overflow is counted."""
    from twopaco_tpu.parallel import sharded as sh

    cfg = kernels.PassConfig(k=5, q=2, f=8, layout="byte")
    scfg = ShardedConfig(base=cfg, n_devices=4)
    # owner = idx % 4, local = idx // 4
    idx = jnp.asarray(
        [0, 1, 64, 65, 66, 200, 255, 100, 130], dtype=jnp.uint64
    )
    valid = jnp.asarray([1, 1, 1, 1, 1, 1, 1, 0, 1], bool)
    send, route, overflow = sh._bucket(idx, valid, scfg, cap=2)
    send = np.asarray(send)
    SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
    # owners: [0,1,0,1,2,0,3,(0 invalid),2]; owner 0 gets {0,64,200}:
    # 200 overflows at cap=2
    assert int(overflow) == 1
    np.testing.assert_array_equal(send[0], [0, 64 // 4])
    np.testing.assert_array_equal(send[1], [1 // 4, 65 // 4])
    np.testing.assert_array_equal(send[2], [66 // 4, 130 // 4])
    np.testing.assert_array_equal(send[3], [255 // 4, SENT])
