"""Deterministic synthetic pangenome for benchmarking.

Mirrors the reference's paper workload shape (many closely related
genomes, README.md:24-26 / data.txt): one random base sequence plus
mutated copies (substitutions + sparse N runs), generated with
vectorized numpy so 100s of Mbases are cheap.
"""

from __future__ import annotations

import os

import numpy as np

_ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_bench_genomes(
    n_seqs: int = 8,
    length: int = 8_000_000,
    snp_rate: float = 0.01,
    n_rate: float = 1e-4,
    seed: int = 2016,
) -> list[np.ndarray]:
    """Returns byte arrays (ASCII) of the sequences."""
    rng = np.random.default_rng(seed)
    base = _ALPHA[rng.integers(0, 4, size=length)]
    seqs = [base]
    for i in range(1, n_seqs):
        s = base.copy()
        flip = rng.random(length) < snp_rate
        s[flip] = _ALPHA[rng.integers(0, 4, size=int(flip.sum()))]
        ns = rng.random(length) < n_rate
        s[ns] = ord("N")
        seqs.append(s)
    return seqs


def write_bench_fasta(
    path: str,
    n_seqs: int = 8,
    length: int = 8_000_000,
    seed: int = 2016,
) -> str:
    """Write (or reuse) the benchmark FASTA; returns the path."""
    marker = f"{path}.ok-{n_seqs}x{length}-s{seed}"
    if os.path.exists(marker) and os.path.exists(path):
        return path
    seqs = make_bench_genomes(n_seqs=n_seqs, length=length, seed=seed)
    with open(path, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(f">g{i}\n".encode())
            # 80-col wrapping is unnecessary for parsers; single line is fine
            f.write(s.tobytes())
            f.write(b"\n")
    with open(marker, "w") as f:
        f.write("ok\n")
    return path
