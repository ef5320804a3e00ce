"""The standalone truth-set generator must regenerate the COMMITTED
reference truth files byte-for-byte (the independence property the
reference's generate_truth_set.py provides), and random_vcf output must
round-trip through the pipeline."""

import shutil
import subprocess
import sys

from .ref_fixtures import tmp_prefix

DATA = "/root/reference/tests/data"
REPO = __file__.rsplit("/tests/", 1)[0]


def test_generate_truth_set_reproduces_committed(tmp_path):
    for t in ("single_chrom", "mult_chroms"):
        fa = tmp_path / f"{t}.fa"
        shutil.copy(f"{DATA}/{t}.fa", fa)
        out = str(tmp_path / t)
        r = subprocess.run(
            [sys.executable, f"{REPO}/scripts/generate_truth_set.py",
             str(fa), f"{DATA}/{t}.vcf.gz", "-o", out],
            capture_output=True,
        )
        assert r.returncode == 0, r.stderr.decode()
        for ext in (".bwt", ".sa", ".markers"):
            got = open(out + ext, "rb").read()
            want = open(f"{DATA}/{t}{ext}", "rb").read()
            assert got == want, f"{t}{ext}"


def test_random_vcf_script_roundtrips(tmp_path, rng):
    import numpy as np

    fa = tmp_path / "r.fa"
    seq = "".join(rng.choice(list("ACGT"), size=3000))
    fa.write_text(f">c1\n{seq}\n")
    vcf = str(tmp_path / "r.vcf")
    r = subprocess.run(
        [sys.executable, f"{REPO}/scripts/random_vcf.py", str(fa),
         "-o", vcf, "--samples", "1", "--seed", "3"],
        capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode()
    from pfbwtf_tpu.vcf.reader import VCF

    v = VCF(vcf)
    assert v.samples == ["s0"]
    assert len(list(v.records_for_contig("c1"))) > 0
