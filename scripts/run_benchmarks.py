"""Reference-vs-ours benchmark matrix (BASELINE.md configs 2-4).

The real datasets behind BASELINE.md (E. coli strains, hg38 chr1) are
not obtainable in this offline environment, so each config runs on a
synthetic stand-in of the same scale and shape (single genome /
62-strain pangenome / chromosome-length single sequence). The reference
binary (/tmp/refbuild) and our CLI run on the SAME input; junction-set
parity is checked with scripts/check_parity.py logic and throughput is
recorded to BENCHMARKS.json + BENCHMARKS.md.

Run SOLO (one TPU process at a time): python scripts/run_benchmarks.py
[config ...] where config in {ecoli, ecoli62, chr1}.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/tmp/refbuild/graphconstructor/twopaco"
_ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)

CONFIGS = {
    # BASELINE.md item 2: single E. coli (4.6 Mb), k=25, f=34
    "ecoli": dict(n_seqs=1, length=4_600_000, k=25, f=34, rounds=1,
                  threads=(1, 4), snp=0.0),
    # item 3: 62 E. coli strains, k=25, r=1
    "ecoli62": dict(n_seqs=62, length=4_600_000, k=25, f=30, rounds=1,
                    threads=(4,), snp=0.01),
    # item 4: human chr1 (~250 Mb), k=31, r=4 (multi-round memory mode)
    "chr1": dict(n_seqs=1, length=250_000_000, k=31, f=30, rounds=4,
                 threads=(4,), snp=0.0),
}


def write_fasta(path: str, cfg: dict, seed: int = 77) -> int:
    marker = f"{path}.ok-{cfg['n_seqs']}x{cfg['length']}-s{seed}"
    if os.path.exists(marker) and os.path.exists(path):
        return cfg["n_seqs"] * cfg["length"]
    rng = np.random.default_rng(seed)
    base = _ALPHA[rng.integers(0, 4, size=cfg["length"])]
    with open(path, "wb") as f:
        for i in range(cfg["n_seqs"]):
            s = base
            if i and cfg["snp"]:
                s = base.copy()
                flip = rng.random(cfg["length"]) < cfg["snp"]
                s[flip] = _ALPHA[rng.integers(0, 4, size=int(flip.sum()))]
            f.write(f">chr{i}\n".encode())
            f.write(s.tobytes())
            f.write(b"\n")
    open(marker, "w").write("ok\n")
    return cfg["n_seqs"] * cfg["length"]


def run_reference(fa, cfg, threads, out):
    t0 = time.monotonic()
    subprocess.run(
        [REF, "-k", str(cfg["k"]), "-f", str(cfg["f"]),
         "-r", str(cfg["rounds"]), "-t", str(threads),
         "--tmpdir", "/tmp", "-o", out, fa],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return time.monotonic() - t0


def run_ours(fa, cfg, out):
    env = dict(os.environ)
    t0 = time.monotonic()
    with open(out + ".log", "ab") as logf:
        subprocess.run(
            [sys.executable, "-m", "twopaco_tpu.cli.twopaco",
             "-k", str(cfg["k"]), "-f", str(cfg["f"]),
             "-r", str(cfg["rounds"]), "-o", out, fa],
            check=True, cwd=REPO, env=env,
            stdout=logf, stderr=subprocess.STDOUT,
        )
    return time.monotonic() - t0


TPCLIENT = os.path.join(REPO, "native", "build", "tpclient")
SOCK = os.environ.get("TWOPACO_SERVER_SOCKET", "/tmp/twopaco_tpu.sock")


def stop_daemon():
    """Cleanly release the daemon's TPU claim (cold runs need it)."""
    import socket as s
    import struct

    if not os.path.exists(SOCK):
        return
    try:
        c = s.socket(s.AF_UNIX, s.SOCK_STREAM)
        c.settimeout(30)
        c.connect(SOCK)
        req = b'{"tool": "__shutdown__", "argv": []}'
        c.sendall(struct.pack("<I", len(req)) + req)
        c.recv(16)
        c.close()
        time.sleep(3)  # PJRT teardown releases the claim
    except OSError:
        pass


def start_daemon():
    """Boot the resident server; returns its Popen. Requests queue
    until warm() finishes, so no readiness wait beyond the bind is
    needed. A stale socket file from a killed daemon would satisfy an
    existence check while the new process is still in its 12-30s boot,
    so remove it first — serve.py recreates it at bind time."""
    try:
        os.unlink(SOCK)
    except FileNotFoundError:
        pass
    logf = open("/tmp/twopaco_serve.log", "ab")
    proc = subprocess.Popen(
        [sys.executable, "-m", "twopaco_tpu.cli.serve"],
        cwd=REPO, stdout=logf, stderr=subprocess.STDOUT,
    )
    deadline = time.monotonic() + 120
    while not os.path.exists(SOCK):
        if time.monotonic() > deadline or proc.poll() is not None:
            raise RuntimeError("serve daemon failed to bind its socket")
        time.sleep(0.5)
    return proc


def run_served(fa, cfg, out):
    """Run via the warm daemon (cli/serve.py + native tpclient): no
    interpreter/PJRT boot, no device claim, in-memory jit cache. The
    timed input must be FRESH to the daemon's session — the axon
    runtime memoizes repeat dispatches on identical inputs."""
    t0 = time.monotonic()
    with open(out + ".log", "ab") as logf:
        subprocess.run(
            [TPCLIENT, "twopaco",
             "-k", str(cfg["k"]), "-f", str(cfg["f"]),
             "-r", str(cfg["rounds"]), "-o", out, fa],
            check=True, cwd=REPO,
            stdout=logf, stderr=subprocess.STDOUT,
        )
    return time.monotonic() - t0


def check_parity(ours, theirs) -> bool:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import check_parity as cp
    from twopaco_tpu.io import junctions

    return cp.partitions_equal(
        junctions.read_junctions(ours), junctions.read_junctions(theirs)
    )


def sync_big5g(results: dict) -> None:
    """The 5 Gbase config is measured by scripts/run_big.py; pull its
    result into the baseline-only entry's note when available."""
    big = results.get("big5g_reference")
    run_big = os.path.join(REPO, "RUN_BIG.json")
    if big and not isinstance(big.get("ours"), dict) \
            and os.path.exists(run_big):
        rb = json.load(open(run_big))
        if "mbases_per_sec" in rb:
            big["ours"] = (
                f"{rb['mbases_per_sec']:.2f} Mb/s warm "
                f"(RUN_BIG.json, parity "
                f"{'PASS' if rb.get('parity_vs_reference') else 'FAIL'})"
            )


def write_md(results: dict) -> None:
    with open(os.path.join(REPO, "BENCHMARKS.md"), "w") as f:
        f.write(
            "# Benchmarks — reference binary vs twopaco-tpu\n\n"
            "Real BASELINE.md datasets are not obtainable offline; each\n"
            "config uses a synthetic stand-in of the same scale "
            "(see scripts/run_benchmarks.py).\nReference = C++ TwoPaCo on "
            f"{os.cpu_count()}-core host; ours = one TPU v5e chip.\n\n"
            "`ours served` = the production serving mode (resident\n"
            "daemon, cli/serve.py + native tpclient): the timed run is a\n"
            "fresh genome the daemon has never dispatched. `ours cold` =\n"
            "a from-scratch CLI process; on this host that includes a\n"
            "12-30 s interpreter+PJRT-plugin boot that exists for every\n"
            "python process (measured: `python -c pass` = 18 s) and is\n"
            "not part of the framework.\n\n"
            "| config | bases | reference best | ours served | speedup | "
            "ours cold | cold speedup | parity |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        notes = []
        for name, e in results.items():
            ref_best = max(
                v["mbases_per_sec"] for v in e["reference"].values()
            )
            # Baseline-only entries (e.g. the 5 Gbase reference runs,
            # whose "ours" side lives in RUN_BIG.json) carry a string
            # instead of a measurement dict — keep them out of the
            # table so the writer never crashes mid-file.
            if not isinstance(e.get("ours"), dict):
                notes.append(
                    f"- **{name}** ({e['total_bases']/1e9:.0f} Gbase): "
                    "reference "
                    + ", ".join(
                        f"{k} {v['mbases_per_sec']:.2f} Mb/s"
                        for k, v in e["reference"].items()
                    )
                    + f"; ours: {e.get('ours', 'see RUN_BIG.json')}"
                )
                continue
            ours = e["ours"]["mbases_per_sec"]
            cold = e.get("ours_cold", {}).get("mbases_per_sec")
            cold_s = (
                f"{cold:.2f} Mb/s | {cold/ref_best:.2f}x"
                if cold else "— | —"
            )
            mode = e["ours"].get("mode", "")
            legacy = "" if mode.startswith("served") else " (cold CLI)"
            f.write(
                f"| {name}{legacy} | {e['total_bases']/1e6:.0f} Mb | "
                f"{ref_best:.2f} Mb/s | {ours:.2f} Mb/s | "
                f"{ours/ref_best:.2f}x | {cold_s} | "
                f"{'PASS' if e['parity'] else 'FAIL'} |\n"
            )
        if notes:
            f.write("\n## Large-input baselines\n\n")
            f.write("\n".join(notes) + "\n")
    print("wrote BENCHMARKS.json / BENCHMARKS.md")


def main():
    which = sys.argv[1:] or list(CONFIGS)
    path = os.path.join(REPO, "BENCHMARKS.json")
    results = {}
    if os.path.exists(path):
        results = json.load(open(path))
    if which == ["--md-only"]:
        sync_big5g(results)
        json.dump(results, open(path, "w"), indent=2)
        write_md(results)
        return
    for name in which:
        cfg = CONFIGS[name]
        fa = f"/tmp/bench_{name}.fa"
        total = write_fasta(fa, cfg)
        entry = dict(config=cfg, total_bases=total, reference={},
                     synthetic_stand_in=True)
        for t in cfg["threads"]:
            # warm run discarded? reference is disk-streaming; one run
            dt = run_reference(fa, cfg, t, f"/tmp/bench_{name}_ref.dbg")
            entry["reference"][f"t{t}"] = dict(
                seconds=round(dt, 2),
                mbases_per_sec=round(total / dt / 1e6, 3),
            )
            print(f"{name} reference t={t}: {dt:.1f}s "
                  f"{total/dt/1e6:.2f} Mb/s", flush=True)
        # ours, cold CLI process: first run pays one-time XLA compiles
        # (persisted); the second run's wall still includes the
        # per-process interpreter + PJRT-plugin boot (~12-30s on this
        # host) and the in-process retrace — the reference binary's
        # equivalent costs are milliseconds. The TPU is single-tenant:
        # the daemon must not hold the claim during cold runs.
        stop_daemon()
        run_ours(fa, cfg, f"/tmp/bench_{name}_tpu.dbg")
        dt = run_ours(fa, cfg, f"/tmp/bench_{name}_tpu.dbg")
        entry["ours_cold"] = dict(
            seconds=round(dt, 2),
            mbases_per_sec=round(total / dt / 1e6, 3),
        )
        print(f"{name} ours cold: {dt:.1f}s {total/dt/1e6:.2f} Mb/s",
              flush=True)
        # ours, served (production serving mode): warm on one fresh
        # genome, time on another fresh genome — each unseen by the
        # daemon's session so no dispatch memoization can hit; parity
        # is checked on the cold run's output (canonical input)
        warm_fa = f"/tmp/bench_{name}_warm.fa"
        timed_fa = f"/tmp/bench_{name}_timed.fa"
        write_fasta(warm_fa, cfg, seed=int(time.time()) | 1)
        write_fasta(timed_fa, cfg, seed=(int(time.time()) | 1) + 2)
        # The daemon holds the single-tenant TPU claim; any exception
        # here must still tear it down or the next process stalls on
        # the stale claim for up to the 1800s idle timeout.
        daemon = start_daemon()
        try:
            run_served(warm_fa, cfg, f"/tmp/bench_{name}_srv.dbg")
            dt = run_served(timed_fa, cfg, f"/tmp/bench_{name}_srv.dbg")
            entry["ours"] = dict(
                seconds=round(dt, 2),
                mbases_per_sec=round(total / dt / 1e6, 3),
                mode="served (warm daemon, cli/serve.py)",
            )
            print(f"{name} ours served: {dt:.1f}s "
                  f"{total/dt/1e6:.2f} Mb/s", flush=True)
        finally:
            stop_daemon()
            try:
                daemon.wait(timeout=60)
            except subprocess.TimeoutExpired:
                daemon.terminate()
                try:
                    daemon.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    daemon.kill()
                    daemon.wait()
        import glob as _glob

        for tmp_fa in (warm_fa, timed_fa):
            for junk in [tmp_fa] + _glob.glob(tmp_fa + ".ok*"):
                try:
                    os.remove(junk)
                except OSError:
                    pass
        entry["parity"] = check_parity(
            f"/tmp/bench_{name}_tpu.dbg", f"/tmp/bench_{name}_ref.dbg"
        )
        print(f"{name} parity: {'PASS' if entry['parity'] else 'FAIL'}",
              flush=True)
        results[name] = entry
        json.dump(results, open(path, "w"), indent=2)

    sync_big5g(results)
    json.dump(results, open(path, "w"), indent=2)
    write_md(results)


if __name__ == "__main__":
    main()
