"""Compare two junction binaries for reference-parity.

Parity (SURVEY.md §5, verified there): identical (chr, pos) occurrence
sets and identical partition of occurrences into junction classes —
raw ids are urandom-seeded in the reference and never comparable.

Usage: python scripts/check_parity.py ours.dbg theirs.dbg
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from twopaco_tpu.io import junctions


def _aligned(a, b):
    """Sort both runs by (chr, pos); returns (|ids_a|, |ids_b|) aligned,
    or None if the occurrence sets differ."""
    ca, pa, ia = a
    cb, pb, ib = b
    if len(ia) != len(ib):
        return None
    oa = np.lexsort((pa, ca))
    ob = np.lexsort((pb, cb))
    if not (
        np.array_equal(ca[oa], cb[ob]) and np.array_equal(pa[oa], pb[ob])
    ):
        return None
    return np.abs(ia[oa]), np.abs(ib[ob])


def partitions_equal(a, b) -> bool:
    """Same partition into junction classes, fully vectorized: the
    (|id_a|, |id_b|) pairing over aligned occurrences must be a
    bijection — #distinct pairs == #distinct ids on each side.
    (Signs fold: +x and -x are one junction, strand is id-internal.)"""
    al = _aligned(a, b)
    if al is None:
        return False
    ia, ib = al
    pairs = (ia.astype(np.uint64) << np.uint64(32)) | ib.astype(np.uint64)
    return (
        len(np.unique(pairs))
        == len(np.unique(ia))
        == len(np.unique(ib))
    )


def partition_signature(c, pos, ids):
    """Canonical form of the occurrence partition (small inputs /
    debugging; O(classes) Python — use partitions_equal at scale)."""
    order = np.lexsort((pos, c, np.abs(ids)))
    c, pos, ids = c[order], pos[order], np.abs(ids[order])
    sig = []
    start = 0
    for i in range(1, len(ids) + 1):
        if i == len(ids) or ids[i] != ids[start]:
            sig.append(tuple(zip(c[start:i].tolist(), pos[start:i].tolist())))
            start = i
    sig.sort()
    return sig


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = junctions.read_junctions(a_path)
    b = junctions.read_junctions(b_path)
    al = _aligned(a, b)
    if al is None:
        print(
            f"POSITION MISMATCH (|a|={len(a[2])} |b|={len(b[2])})"
        )
        return 1
    print(f"positions: {len(a[2])} occurrences identical")
    if not partitions_equal(a, b):
        print("PARTITION MISMATCH")
        return 1
    print(
        f"partition: {len(np.unique(np.abs(a[2])))} junction classes "
        "identical"
    )
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
