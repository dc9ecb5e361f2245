"""Benchmark: end-to-end junction enumeration throughput on real TPU.

Prints JSON lines; the LAST line is the result:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Workload: the BASELINE_MEASURED.json dataset (8 x 8 Mbase synthetic
pangenome, 1% SNP, k=25, f=30) — the same input measured on the
reference C++ binary (scripts/measure_baseline.py). vs_baseline is our
bases/s divided by the reference's best multithreaded bases/s on this
machine.

Capture contract (the driver runs this once, cold, under a kill
timeout; two past rounds lost their number to compile stalls — the
structure below makes a nonzero captured value unconditional):
  - Phase 0 "insurance": a 2 Mbase run on the small shape tier
    (2048x256 / 2^22) — tiny programs that compile in well under two
    minutes even on a wiped compile cache. Its timed result is emitted
    immediately: a nonzero line exists early no matter what follows.
  - Phase 1 "tier22": the full 64 Mbase dataset on the 2^22 sort tier
    (the config that banked 13.03 Mb/s in BENCH_r03.json). Its shapes
    are the ones ordinary CLI/test traffic keeps compiled.
  - Phase 2 "tier26": the 2^26 one-big-sort tier — fastest when warm,
    but its 65M-row programs take multi-minute fresh compiles, so it
    runs LAST and only with deadline margin to spare.
  - EVERY completed run — warmups included — updates the best-so-far
    line (warmup throughput is a valid lower bound on the engine).
  - A watchdog prints the best-so-far JSON line and exits at
    TWOPACO_BENCH_DEADLINE_S (default 780s) from process start, so a
    hung device claim or a slow remote compile can never leave the
    driver with empty output.

Reported value convention (stated in the JSON too): best (minimum
wall-clock) of the timed runs across all phases; each timed run is a
fresh unseen genome of identical shape (the axon runtime memoizes
repeat dispatches on identical inputs, so re-running the warmup input
would time a cache, not the device). Warmup runs only ever *seed* the
best-so-far; a completed timed run always supersedes them.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K, F = 25, 30
FA = "/tmp/twopaco_bench.fa"
OUT = "/tmp/tpu_bench.dbg"

# per-invocation seed base: every run (including the driver's final
# one) times genomes NO previous process has dispatched — the axon
# runtime memoizes repeat dispatches on identical inputs across
# processes, so fixed seeds would eventually time a cache, not the
# device. Shapes stay identical, so the XLA compile cache still hits.
SEED_BASE = 10_000 + (int(time.time()) % 1_000_000) * 10

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("TWOPACO_BENCH_DEADLINE_S", 780))

# best-so-far result dict; the watchdog prints it if time runs out
_best_lock = threading.Lock()
_best_line: dict | None = None
_best_bps = -1.0  # bases/s of the best line
_best_is_warmup = True  # timed runs always supersede warmup seeds


def _emit(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _offer_best(obj: dict, bps: float, warmup: bool) -> bool:
    """Update best-so-far; timed beats warmup, then higher bases/s."""
    global _best_line, _best_bps, _best_is_warmup
    with _best_lock:
        better = (_best_is_warmup and not warmup) or (
            _best_is_warmup == warmup and bps > _best_bps
        )
        if better:
            _best_line, _best_bps, _best_is_warmup = obj, bps, warmup
        return better


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _watchdog() -> None:
    rem = _remaining()
    if rem > 0:
        time.sleep(rem)
    with _best_lock:
        line = _best_line or {
            "metric": "junction enumeration throughput",
            "value": 0,
            "unit": "Mbases/s/chip",
            "vs_baseline": None,
            "error": f"bench deadline {_DEADLINE_S:.0f}s hit before any "
            "run finished (device claim or remote compile stalled)",
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
    phase: str,
    runs_s: list,
    warm_s: float,
    warmup: bool,
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
            "phase": phase,
            "convention": "best (min wall-clock) of timed runs on "
            "unseen same-shape genomes across all phases; warmup runs "
            "only seed best-so-far and never outrank a timed run",
            "phase_runs_seconds": [round(r, 2) for r in runs_s],
            "warmup_seconds": round(warm_s, 2),
            "distinct_junctions": enum.vertices_count,
            "occurrences": enum.stats.occurrences,
            "device": str(jax.devices()[0]),
            "timings": {
                k: round(v, 2) for k, v in enum.stats.timings.items()
            },
        },
    }
    if warmup:
        line["detail"]["warmup_only"] = True
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


def _run_phase(
    name: str,
    n_seqs: int,
    length: int,
    positions: int,
    rows: int,
    sort_chunk: int,
    timed_seeds: tuple,
    vs_base,
    log,
) -> None:
    """Warmup + timed runs for one shape tier; updates best-so-far."""
    from twopaco_tpu.passes import PipelineConfig, build_junctions
    from twopaco_tpu.testing.bench_data import write_bench_fasta

    total_bases = n_seqs * length
    fa = FA if (n_seqs, length) == (8, 8_000_000) else (
        f"/tmp/twopaco_bench_{n_seqs}x{length}.fa"
    )
    # warmup input is the FIXED dataset (seed 2016): its dispatches may
    # be memoized from earlier processes, which only makes warmup
    # cheaper — a warmup line is a lower bound either way
    write_bench_fasta(fa, n_seqs=n_seqs, length=length)

    cfg = PipelineConfig(
        k=K,
        filter_bits=F,
        layout="byte",
        positions_per_row=positions,
        rows_per_batch=rows,
        sort_chunk=sort_chunk,
    )

    t0 = time.time()
    enum = build_junctions([fa], cfg, out_path=OUT, log=log)
    warm_s = time.time() - t0
    # warmup seeds best-so-far: its throughput (compiles included) is a
    # valid lower bound, so the watchdog never reports 0 past this point
    _offer_best(
        _result_line(
            warm_s, enum, total_bases, vs_base, name, [], warm_s, True
        ),
        total_bases / warm_s,
        warmup=True,
    )

    # fresh seeds every invocation — drop prior runs' timed genomes
    import glob

    for old in glob.glob(f"{fa}.timed*"):
        try:
            os.remove(old)
        except OSError:
            pass

    runs = []
    for seed in timed_seeds:
        # margin check: don't start a run that would cross the deadline
        margin = 1.5 * max([r[0] for r in runs] + [warm_s * 0.5])
        if _remaining() < margin:
            break
        f2 = f"{fa}.timed{seed}.fa"
        write_bench_fasta(f2, n_seqs=n_seqs, length=length, seed=seed)
        t0 = time.time()
        enum = build_junctions([f2], cfg, out_path=OUT, log=log)
        runs.append((time.time() - t0, enum))
        dt, best_enum = min(runs, key=lambda r: r[0])
        line = _result_line(
            dt, best_enum, total_bases, vs_base, name,
            [r[0] for r in runs], warm_s, False,
        )
        if _offer_best(line, total_bases / dt, warmup=False) and (
            len(runs) == 1
        ):
            # early emit: a timed line survives a driver kill
            _emit(line)


def main() -> None:
    quick = "--quick" in sys.argv
    threading.Thread(target=_watchdog, daemon=True).start()
    _release_daemon()
    _wait_tunnel()

    log = (lambda s: print(s, file=sys.stderr, flush=True)) if (
        "--verbose" in sys.argv
    ) else (lambda s: None)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = max(v["bases_per_sec"] for v in base["reference"].values())
        vs_base = lambda bps: round(bps / ref, 3)  # noqa: E731
    else:
        vs_base = lambda bps: None  # noqa: E731

    def phase_safe(name, *args):
        """A phase that dies (tunnel RuntimeError mid-run, OOM on a
        fresh shape tier) must not take the already-banked best-so-far
        line down with the process — the capture contract says a
        completed run's line always survives."""
        try:
            _run_phase(name, *args)
        except Exception as e:  # noqa: BLE001
            print(f"phase {name} failed: {e!r}", file=sys.stderr, flush=True)

    # Phase 0 — insurance: tiny input, small always-warm shape tier.
    # Completes (incl. fresh compiles) in ~2 min on a cold cache.
    phase_safe(
        "insurance-2Mbase-tier22", 2, 1_000_000, 2048, 256, 1 << 22,
        (SEED_BASE,), vs_base, log,
    )
    with _best_lock:
        line0 = _best_line
    if line0:
        _emit(line0)
    if quick:
        return

    # Phase 1 — the BENCH_r03 config: full dataset, 2^22 sort tier
    # (shapes kept warm by regular CLI/test traffic; 13.03 Mb/s in r03)
    if _remaining() > 120:
        phase_safe(
            "64Mbase-tier22", 8, 8_000_000, 16384, 128, 1 << 22,
            (SEED_BASE + 1, SEED_BASE + 2, SEED_BASE + 3), vs_base, log,
        )

    # Phase 2 — the 2^26 one-big-sort tier: fastest warm, multi-minute
    # fresh compiles cold — attempted last, only with margin to spare
    if _remaining() > 180:
        phase_safe(
            "64Mbase-tier26", 8, 8_000_000, 16384, 128, 1 << 26,
            tuple(SEED_BASE + i for i in range(4, 9)), vs_base, log,
        )

    with _best_lock:
        final = _best_line
    if final is not None:
        _emit(final)
    else:  # every phase failed before its warmup completed
        _emit(
            {
                "metric": "junction enumeration throughput",
                "value": 0,
                "unit": "Mbases/s/chip",
                "vs_baseline": None,
                "error": "all bench phases raised before any run "
                "completed (see stderr)",
            }
        )


if __name__ == "__main__":
    main()
