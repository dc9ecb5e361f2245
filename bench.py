"""Benchmark: end-to-end junction enumeration throughput on real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: the BASELINE_MEASURED.json dataset (8 x 8 Mbase synthetic
pangenome, 1% SNP, k=25, f=30) — the same input measured on the
reference C++ binary (scripts/measure_baseline.py). vs_baseline is our
bases/s divided by the reference's best multithreaded bases/s on this
machine. The first invocation pays one-time XLA compiles (persisted in
the compile cache); the timed run is the second, warm pass.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K, F = 25, 30
N_SEQS, LENGTH = 8, 8_000_000
FA = "/tmp/twopaco_bench.fa"
OUT = "/tmp/tpu_bench.dbg"


def _wait_tunnel(
    max_wait_s: int = int(os.environ.get("TWOPACO_TUNNEL_WAIT_S", 1800)),
) -> None:
    """The remote-TPU relay (127.0.0.1:8082...) can be down; touching
    jax then hangs FOREVER in a claim-retry loop. Wait for it (it is
    restarted out-of-band) and fail loudly instead of hanging."""
    import socket

    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        for port in (8082, 8092, 8102, 8112):
            try:
                with socket.create_connection(("127.0.0.1", port), 1):
                    return
            except OSError:
                pass
        time.sleep(10)
    print(
        json.dumps(
            {
                "metric": "junction enumeration throughput",
                "value": 0,
                "unit": "Mbases/s/chip",
                "vs_baseline": None,
                "error": "TPU tunnel relay down (ports 8082+) for "
                f"{max_wait_s}s — cannot reach the device",
            }
        )
    )
    sys.exit(1)


def main() -> None:
    quick = "--quick" in sys.argv
    n_seqs, length = (2, 1_000_000) if quick else (N_SEQS, LENGTH)
    _wait_tunnel()

    from twopaco_tpu.testing.bench_data import write_bench_fasta

    fa = FA if not quick else "/tmp/twopaco_bench_quick.fa"
    write_bench_fasta(fa, n_seqs=n_seqs, length=length)
    # every timed run uses a DIFFERENT genome of identical shape: the
    # axon runtime memoizes repeat dispatches on identical inputs, so
    # rerunning the warmup input would time a cache, not the device
    # (compile cache still hits — shapes are equal)
    timed_fas = []
    for seed in (777, 778, 779):
        f2 = f"{fa}.timed{seed}.fa"
        write_bench_fasta(f2, n_seqs=n_seqs, length=length, seed=seed)
        timed_fas.append(f2)
    total_bases = n_seqs * length

    from twopaco_tpu.passes import PipelineConfig, build_junctions

    cfg = PipelineConfig(
        k=K,
        filter_bits=F,
        layout="byte",
        positions_per_row=16384,
        rows_per_batch=128,
    )

    log = (lambda s: print(s, file=sys.stderr, flush=True)) if (
        "--verbose" in sys.argv
    ) else (lambda s: None)

    # warm-up run: compiles (persisted) + page-in; then timed runs on
    # unseen genomes — best of 3 (the remote-TPU tunnel has heavy
    # run-to-run variance; the best run reflects the device)
    t0 = time.time()
    build_junctions([fa], cfg, out_path=OUT, log=log)
    warm_s = time.time() - t0

    runs = []
    for f2 in timed_fas[: 1 if quick else 3]:
        t0 = time.time()
        enum = build_junctions([f2], cfg, out_path=OUT, log=log)
        runs.append((time.time() - t0, enum))
    dt, enum = min(runs, key=lambda r: r[0])

    bases_per_sec = total_bases / dt

    vs_baseline = None
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path) and not quick:
        with open(baseline_path) as f:
            base = json.load(f)
        ref = max(
            v["bases_per_sec"] for v in base["reference"].values()
        )
        vs_baseline = round(bases_per_sec / ref, 3)

    import jax

    print(
        json.dumps(
            {
                "metric": "junction enumeration throughput (end-to-end, "
                f"k={K} f={F}, {total_bases/1e6:.0f} Mbase pangenome)",
                "value": round(bases_per_sec / 1e6, 3),
                "unit": "Mbases/s/chip",
                "vs_baseline": vs_baseline,
                "detail": {
                    "seconds": round(dt, 2),
                    "all_runs_seconds": [round(r[0], 2) for r in runs],
                    "warmup_seconds": round(warm_s, 2),
                    "distinct_junctions": enum.vertices_count,
                    "occurrences": enum.stats.occurrences,
                    "device": str(jax.devices()[0]),
                    "timings": {
                        k: round(v, 2) for k, v in enum.stats.timings.items()
                    },
                    "round0": {
                        k: (round(v, 2) if isinstance(v, float) else v)
                        for k, v in enum.stats.rounds[0].items()
                    },
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
