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


def partition_signature(c, pos, ids):
    """Canonical form of the occurrence partition: for each junction
    class (same |id|), the sorted tuple of (chr, pos); classes sorted.
    Signs fold together: +x and -x are the same junction."""
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
    occ_a = set(zip(a[0].tolist(), a[1].tolist()))
    occ_b = set(zip(b[0].tolist(), b[1].tolist()))
    if occ_a != occ_b:
        only_a = list(occ_a - occ_b)[:5]
        only_b = list(occ_b - occ_a)[:5]
        print(f"POSITION MISMATCH: only_in_{a_path}={only_a} "
              f"only_in_{b_path}={only_b} "
              f"(|a|={len(occ_a)} |b|={len(occ_b)})")
        return 1
    print(f"positions: {len(occ_a)} occurrences identical")
    sa = partition_signature(*a)
    sb = partition_signature(*b)
    if sa != sb:
        print(f"PARTITION MISMATCH: {len(sa)} vs {len(sb)} classes")
        for i, (x, y) in enumerate(zip(sa, sb)):
            if x != y:
                print(f" first diff at class {i}: {x[:3]} vs {y[:3]}")
                break
        return 1
    print(f"partition: {len(sa)} junction classes identical")
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
