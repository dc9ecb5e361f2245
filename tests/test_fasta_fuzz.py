"""FASTA acceptance fuzz: our parser vs the reference binary.

The reference binary (if built at /tmp/refbuild) is fed the same
generated inputs; accept/reject decisions must agree. Skipped when the
binary is missing (zero-egress CI can't rebuild it).
"""

import os
import subprocess

import numpy as np
import pytest

from twopaco_tpu.io import fasta

REF = "/tmp/refbuild/graphconstructor/twopaco"

CASES = [
    (">s\nACGT\n", True),
    (">s\nacgtn\n", True),
    (">s\nACG T\n\nGG\n", True),
    (">s\nURYKMSWBDHXV\n", True),  # ambiguity codes
    (">s\nACGZ\n", False),  # invalid letter
    (">s\nAC-GT\n", False),  # gap char invalid
    (">s\nAC GT\r\nTT\n", True),  # CR and spaces are whitespace
    ("ACGT\n", False),  # missing header
    (">\nACGT\n", True),  # empty header token
    (">a\n>b\nACGT\n", True),  # empty first record
    (">s\nAC1GT\n", False),  # digit
]


def _ours_accepts(text: str, tmp_path) -> bool:
    p = tmp_path / "f.fa"
    p.write_text(text)
    try:
        list(fasta.read_fasta(p))
        return True
    except fasta.FastaError:
        return False


def _ref_accepts(text: str, tmp_path) -> bool:
    p = tmp_path / "r.fa"
    p.write_text(text)
    r = subprocess.run(
        [REF, "-k", "5", "-f", "16", "--tmpdir", str(tmp_path), "-o",
         str(tmp_path / "o.bin"), str(p)],
        capture_output=True,
        timeout=60,
    )
    # invalid chars / bad headers surface as 'Error:' with rc != 0
    return r.returncode == 0


@pytest.mark.parametrize("text,want", CASES)
def test_acceptance_cases(tmp_path, text, want):
    assert _ours_accepts(text, tmp_path) == want


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not built")
@pytest.mark.parametrize("text,want", CASES)
def test_acceptance_matches_reference(tmp_path, text, want):
    assert _ref_accepts(text, tmp_path) == want


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not built")
def test_acceptance_fuzz_random(tmp_path):
    rng = np.random.default_rng(0)
    alphabet = list("ACGTNacgtn RYSWKZ17->\n\t")
    for trial in range(25):
        body = "".join(rng.choice(alphabet, size=40))
        text = f">s{trial}\n{body}\n"
        ours = _ours_accepts(text, tmp_path)
        ref = _ref_accepts(text, tmp_path)
        assert ours == ref, f"disagree on {text!r}: ours={ours} ref={ref}"
