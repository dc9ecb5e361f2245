"""One-time measurement of the reference TwoPaCo binary on this machine.

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it for
the vs_baseline denominator. Requires the reference build at
/tmp/refbuild (cmake /root/reference/src && make).
"""
import json, os, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from twopaco_tpu.testing.bench_data import write_bench_fasta

REF = "/tmp/refbuild/graphconstructor/twopaco"
FA = "/tmp/twopaco_bench.fa"
N_SEQS, LENGTH, K, F = 8, 8_000_000, 25, 30

def main():
    write_bench_fasta(FA, n_seqs=N_SEQS, length=LENGTH)
    total_bases = N_SEQS * LENGTH
    results = {}
    for threads in (1, 4):
        t0 = time.time()
        subprocess.run(
            [REF, "-k", str(K), "-f", str(F), "-t", str(threads),
             "--tmpdir", "/tmp", "-o", "/tmp/ref_bench.dbg", FA],
            check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        dt = time.time() - t0
        results[f"t{threads}"] = dict(
            seconds=round(dt, 2),
            bases_per_sec=round(total_bases / dt, 1),
        )
        print(f"reference t={threads}: {dt:.1f}s "
              f"{total_bases/dt/1e6:.2f} Mbases/s", flush=True)
    out = dict(
        dataset=dict(n_seqs=N_SEQS, length=LENGTH, k=K, f=F,
                     total_bases=total_bases, snp_rate=0.01, seed=2016),
        machine=dict(cpus=os.cpu_count()),
        reference=results,
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)

if __name__ == "__main__":
    main()
