"""Native C++ FASTA encoder: equivalence with the numpy parser."""

import numpy as np
import pytest

from twopaco_tpu.io import fasta, native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_matches_numpy(tmp_path, lib_ok):
    p = tmp_path / "x.fa"
    p.write_text(
        ">seq1 description here\nACGT\nacgtn\n>seq2\n\nTTgg\n>empty\n>s4\nYRWK\n"
    )
    nat = native.encode_fasta_native(str(p))
    buf = np.fromfile(str(p), dtype=np.uint8)
    ref = list(fasta._parse_buffer(buf, str(p)))
    assert [h for h, _ in nat] == [h for h, _ in ref]
    for (_, a), (_, b) in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_native_invalid_char(tmp_path, lib_ok):
    p = tmp_path / "bad.fa"
    p.write_text(">s\nACGZ\n")
    with pytest.raises(RuntimeError):
        native.encode_fasta_native(str(p))


def test_native_missing_file(lib_ok):
    with pytest.raises(RuntimeError):
        native.encode_fasta_native("/tmp/definitely_missing_xyz.fa")


def test_read_fasta_uses_native_transparently(tmp_path, lib_ok):
    p = tmp_path / "x.fa"
    p.write_text(">a\nACGTN\n")
    recs = list(fasta.read_fasta(p))
    assert recs[0][0] == "a"
    np.testing.assert_array_equal(recs[0][1], [0, 1, 2, 3, 4])


def test_native_throughput_sane(tmp_path, lib_ok):
    """Native encode of 8 MB should beat 200 MB/s comfortably."""
    import time

    from twopaco_tpu.testing.bench_data import write_bench_fasta

    fa = str(tmp_path / "bench.fa")
    write_bench_fasta(fa, n_seqs=1, length=8_000_000)
    dt = min(
        _timed(lambda: native.encode_fasta_native(fa)) for _ in range(3)
    )
    recs = native.encode_fasta_native(fa)
    assert len(recs) == 1 and len(recs[0][1]) == 8_000_000
    assert 8_000_000 / dt > 1e8, f"native encode too slow: {dt:.3f}s"


def _timed(fn):
    import time

    t0 = time.time()
    fn()
    return time.time() - t0
