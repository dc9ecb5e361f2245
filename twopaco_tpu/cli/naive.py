"""naive constructor: exact junction list without the Bloom pipeline.

Analogue of the reference's (unbuilt) src/naiveconstructor — an exact
external oracle (naiveconstructor.cpp:61-220). Unlike the reference,
which emits unsigned sequential ids, this tool uses the SAME
deterministic id scheme as the main pipeline (signed ranks in the sorted
canonical k-mer table, input-order stub ids), so its output is
byte-identical to `twopaco`'s on any input — a true end-to-end
differential oracle for small data.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from twopaco_tpu import dna
from twopaco_tpu.io import fasta as fasta_io
from twopaco_tpu.io import junctions as junction_io
from twopaco_tpu.passes.pipeline import STUB_ID_OFFSET
from twopaco_tpu.testing import oracle


def naive_junction_file(seqs: list[str], k: int, out_path: str) -> int:
    junc, marks = oracle.find_junctions_naively(seqs, k)
    canon = sorted({min(s, dna.revcomp_str(s)) for s in junc})
    if canon:
        table = np.stack([dna.pack_kmer_str(s) for s in canon])
        keys = dna.words_to_bytes_keys(table)
    else:
        keys = np.zeros(0, dtype="S4")

    def lookup(kmer: str) -> int:
        key = dna.words_to_bytes_keys(dna.pack_kmer_str(kmer)[None, :])[0]
        i = int(np.searchsorted(keys, key))
        if i < len(keys) and keys[i] == key:
            return i + 1
        return 0

    stub_id = len(canon) + STUB_ID_OFFSET
    with junction_io.JunctionWriter(out_path) as w:
        for sid, s in enumerate(seqs):
            if len(s) < k:
                continue
            for pos in np.nonzero(marks[sid])[0]:
                kmer = s[pos : pos + k]
                jid = None
                if all(c in "ACGT" for c in kmer):
                    i = lookup(kmer)
                    if i:
                        jid = i
                    else:
                        i = lookup(dna.revcomp_str(kmer))
                        if i:
                            jid = -i
                if jid is None:
                    if pos == 0 or pos == len(s) - k:
                        jid = stub_id
                        stub_id += 1
                    else:  # pragma: no cover - marks imply junction
                        continue
                w.write(sid, int(pos), jid)
    return len(canon)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="naiveconstructor",
        description="Exact (oracle) junction list constructor",
    )
    p.add_argument("-k", "--kvalue", type=int, default=25)
    p.add_argument("-o", "--outfile", default="de_bruijn.bin")
    p.add_argument("filenames", nargs="+")
    args = p.parse_args(argv)
    if args.kvalue % 2 != 1:
        print("Error: value of K must be odd", file=sys.stderr)
        return 1
    seqs = list(fasta_io.read_sequences_text(args.filenames))
    n = naive_junction_file(seqs, args.kvalue, args.outfile)
    print(f"Distinct junctions = {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
