"""Benchmark: end-to-end junction enumeration throughput on real TPU.

Prints JSON lines; the LAST line is the result:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: the BASELINE_MEASURED.json dataset (8 x 8 Mbase synthetic
pangenome, 1% SNP, k=25, f=30) — the same input measured on the
reference C++ binary (scripts/measure_baseline.py). vs_baseline is our
bases/s divided by the reference's best multithreaded bases/s on this
machine. The first invocation pays one-time XLA compiles (persisted in
the compile cache); the timed runs are warm passes on unseen genomes.

Robustness contract (the driver runs this under a kill timeout):
  - If the TPU tunnel relay is down, wait at most TWOPACO_TUNNEL_WAIT_S
    (default 240s), then print an error JSON line and exit.
  - A watchdog prints the best-so-far JSON line and exits at
    TWOPACO_BENCH_DEADLINE_S (default 780s) from process start, so a
    hung device claim or a slow remote compile can never leave the
    driver with empty output.
  - A partial result line is printed as soon as the first timed run
    finishes; the final line supersedes it.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K, F = 25, 30
N_SEQS, LENGTH = 8, 8_000_000
FA = "/tmp/twopaco_bench.fa"
OUT = "/tmp/tpu_bench.dbg"

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("TWOPACO_BENCH_DEADLINE_S", 780))

# best-so-far result dict; the watchdog prints it if time runs out
_best_lock = threading.Lock()
_best_line: dict | None = None


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _set_best(obj: dict) -> None:
    global _best_line
    with _best_lock:
        _best_line = obj


def _watchdog() -> None:
    remaining = _DEADLINE_S - (time.monotonic() - _T0)
    if remaining > 0:
        time.sleep(remaining)
    with _best_lock:
        line = _best_line or {
            "metric": "junction enumeration throughput",
            "value": 0,
            "unit": "Mbases/s/chip",
            "vs_baseline": None,
            "error": f"bench deadline {_DEADLINE_S:.0f}s hit before any "
            "timed run finished (device claim or remote compile stalled)",
        }
    _emit(line)
    sys.stdout.flush()
    os._exit(0)


def _wait_tunnel(
    max_wait_s: float = float(os.environ.get("TWOPACO_TUNNEL_WAIT_S", 240)),
) -> None:
    """The remote-TPU relay (127.0.0.1:8082...) can be down; touching
    jax then hangs FOREVER in a claim-retry loop. Wait for it (it is
    restarted out-of-band) and fail loudly instead of hanging."""
    import socket

    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait_s:
        for port in (8082, 8092, 8102, 8112):
            try:
                with socket.create_connection(("127.0.0.1", port), 1):
                    return
            except OSError:
                pass
        time.sleep(5)
    _emit(
        {
            "metric": "junction enumeration throughput",
            "value": 0,
            "unit": "Mbases/s/chip",
            "vs_baseline": None,
            "error": "TPU tunnel relay down (ports 8082+) for "
            f"{max_wait_s:.0f}s — cannot reach the device",
        }
    )
    sys.exit(1)


def _result_line(
    dt: float,
    enum,
    total_bases: int,
    vs_base,
    runs: list,
    warm_s: float,
    partial: bool,
) -> dict:
    import jax

    line = {
        "metric": "junction enumeration throughput (end-to-end, "
        f"k={K} f={F}, {total_bases/1e6:.0f} Mbase pangenome)",
        "value": round(total_bases / dt / 1e6, 3),
        "unit": "Mbases/s/chip",
        "vs_baseline": vs_base(total_bases / dt),
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
        },
    }
    if partial:
        line["detail"]["partial"] = True
    return line


def _release_daemon() -> None:
    """The serve daemon (cli/serve.py) holds the single-tenant TPU
    claim; ask it to exit so this process's claim doesn't stall."""
    import socket
    import struct

    path = os.environ.get("TWOPACO_SERVER_SOCKET", "/tmp/twopaco_tpu.sock")
    if not os.path.exists(path):
        return
    try:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.settimeout(10)
        s.connect(path)
        req = b'{"tool": "__shutdown__", "argv": []}'
        s.sendall(struct.pack("<I", len(req)) + req)
        s.recv(16)
        s.close()
        time.sleep(2)  # let the PJRT client tear down its claim
    except OSError:
        pass


def main() -> None:
    quick = "--quick" in sys.argv
    n_seqs, length = (2, 1_000_000) if quick else (N_SEQS, LENGTH)
    threading.Thread(target=_watchdog, daemon=True).start()
    _release_daemon()
    _wait_tunnel()

    from twopaco_tpu.testing.bench_data import write_bench_fasta

    fa = FA if not quick else "/tmp/twopaco_bench_quick.fa"
    write_bench_fasta(fa, n_seqs=n_seqs, length=length)
    # every timed run uses a DIFFERENT genome of identical shape: the
    # axon runtime memoizes repeat dispatches on identical inputs, so
    # rerunning the warmup input would time a cache, not the device
    # (compile cache still hits — shapes are equal)
    timed_fas = []
    for seed in (777, 778, 779, 780, 781):
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

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path) and not quick:
        with open(baseline_path) as f:
            base = json.load(f)
        ref = max(v["bases_per_sec"] for v in base["reference"].values())
        vs_base = lambda bps: round(bps / ref, 3)  # noqa: E731
    else:
        vs_base = lambda bps: None  # noqa: E731

    # warm-up run: compiles (persisted) + page-in; then timed runs on
    # unseen genomes — best-of-N (the remote-TPU tunnel has heavy
    # run-to-run variance; the best run reflects the device)
    t0 = time.time()
    build_junctions([fa], cfg, out_path=OUT, log=log)
    warm_s = time.time() - t0

    runs = []
    # best-of-5: single-run spread measured at 3.6-6.8s on identical
    # inputs (tunnel + host-fs noise), so extra ~5s draws are the
    # cheapest way to let the device number through
    for f2 in timed_fas[: 1 if quick else 5]:
        t0 = time.time()
        enum = build_junctions([f2], cfg, out_path=OUT, log=log)
        runs.append((time.time() - t0, enum))
        dt, best_enum = min(runs, key=lambda r: r[0])
        line = _result_line(
            dt, best_enum, total_bases, vs_base, runs, warm_s,
            partial=len(runs) < min(5, len(timed_fas)) and not quick,
        )
        _set_best(line)
        if len(runs) == 1:
            # early partial line: survives a watchdog/driver kill
            _emit(line)
        # stop early if the next run would cross the deadline (leave
        # 1.5x the slowest observed run as margin)
        margin = 1.5 * max(r[0] for r in runs)
        if time.monotonic() - _T0 + margin > _DEADLINE_S:
            break

    dt, enum = min(runs, key=lambda r: r[0])
    _emit(
        _result_line(dt, enum, total_bases, vs_base, runs, warm_s, False)
    )


if __name__ == "__main__":
    main()
