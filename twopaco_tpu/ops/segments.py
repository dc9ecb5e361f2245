"""Segmented reductions over SORTED segments, scatter-free.

jax.ops.segment_sum/max lower to XLA scatter-add, which on TPU is a
~13ns/element serial loop. For records already sorted by group (the
sort-join engine's invariant) the same reductions are two log-depth
associative scans — pure vector work at HBM bandwidth:

  1. forward segmented inclusive scan (combine resets at group starts)
     gives prefix aggregates; the value at each group's LAST element is
     the full-group aggregate;
  2. a backward first-wins segmented scan broadcasts that value to every
     element of the group.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _seg_combine(op):
    """Associative combine on (reset_flag, value) pairs, left-to-right:
    (f_a, v_a) then (f_b, v_b) -> (f_a | f_b, v_b if f_b else op(v_a, v_b)).
    """

    def comb(a, b):
        fa, va = a
        fb, vb = b
        f = fa | fb
        v = jnp.where(fb, vb, op(va, vb))
        return f, v

    return comb


def seg_scan(x: jnp.ndarray, new_group: jnp.ndarray, op) -> jnp.ndarray:
    """Inclusive segmented scan along axis 0 (new_group resets)."""
    _f, v = jax.lax.associative_scan(
        _seg_combine(op), (new_group, x), axis=0
    )
    return v


def seg_reduce_broadcast(x: jnp.ndarray, new_group: jnp.ndarray, op) -> jnp.ndarray:
    """Full-group aggregate of x, broadcast to every element."""
    prefix = seg_scan(x, new_group, op)
    m = x.shape[0]
    last = jnp.concatenate([new_group[1:], jnp.ones(1, dtype=bool)])
    # backward first-wins scan: on the reversed array, each group's first
    # element is the original group's last (holding the full aggregate)
    first_wins = lambda va, vb: va
    rev_ng = last[::-1]
    v = seg_scan(prefix[::-1], rev_ng, first_wins)[::-1]
    return v


def seg_sum(x, new_group):
    return seg_reduce_broadcast(x, new_group, jnp.add)


def seg_max(x, new_group):
    return seg_reduce_broadcast(x, new_group, jnp.maximum)


def seg_or(x, new_group):
    return seg_reduce_broadcast(
        x.astype(jnp.int32), new_group, jnp.maximum
    ) > 0
