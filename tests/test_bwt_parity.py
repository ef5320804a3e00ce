"""End-to-end .bwt/.sa/.ssa/.esa byte parity vs the reference pipeline.

Gate for SURVEY.md §7 layers L2-L3 (BASELINE configs 1-2): our full
parse -> parse-BWT -> emission-sort assembly must reproduce the reference
binaries' outputs bit-for-bit, including the SA[0]->n substitution and
run-boundary bookkeeping (pfbwt-f.cpp:298-328).
"""

import numpy as np
import pytest

from pfbwtf_tpu.io import formats
from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
from pfbwtf_tpu.pipeline import PfbwtConfig, run_parser, run_pfbwt

from .ref_fixtures import random_fasta, tmp_prefix

DATA = "/root/reference/tests/data"


def _run_mine(fasta, prefix, w, p, sa=True, rssa=True, ntoa=False, dtype=formats.U64):
    params = ParserParams(w=w, p=p, get_sai=sa or rssa, non_acgt_to_a=ntoa)
    run_parser(fasta, prefix, params, dtype)
    cfg = PfbwtConfig(prefix=prefix, w=w, sa=sa, rssa=rssa, dtype=dtype)
    run_pfbwt(cfg)


def _diff(prefix_ref, prefix_mine, exts):
    for ext in exts:
        a = open(f"{prefix_ref}.{ext}", "rb").read()
        b = open(f"{prefix_mine}.{ext}", "rb").read()
        assert a == b, f".{ext} mismatch ({len(a)} vs {len(b)} bytes)"


@pytest.mark.parametrize("w,p", [(10, 100), (10, 10), (4, 5)])
def test_e2e_parity_single_chrom(ref_tools, w, p):
    fasta = f"{DATA}/single_chrom.fa"
    ref_prefix, my_prefix = tmp_prefix("ref"), tmp_prefix("mine")
    ref_tools.run_pfbwt(fasta, ref_prefix, w=w, p=p, sa=1, rssa=1)
    _run_mine(fasta, my_prefix, w, p)
    _diff(ref_prefix, my_prefix, ["bwt", "sa", "ssa", "esa"])


def test_e2e_parity_mult_chroms(ref_tools):
    fasta = f"{DATA}/mult_chroms.fa"
    ref_prefix, my_prefix = tmp_prefix("ref"), tmp_prefix("mine")
    ref_tools.run_pfbwt(fasta, ref_prefix, w=10, p=100, sa=1, rssa=1)
    _run_mine(fasta, my_prefix, 10, 100)
    _diff(ref_prefix, my_prefix, ["bwt", "sa", "ssa", "esa"])


@pytest.mark.parametrize(
    "seed,nrec,length,w,p",
    [
        (11, 1, 3000, 10, 10),
        (12, 4, 1000, 10, 5),   # small p -> many shared suffixes -> HARD cases
        (13, 2, 2000, 4, 3),
        (14, 1, 500, 2, 2),
        (15, 8, 300, 10, 5),
    ],
)
def test_e2e_parity_fuzz(ref_tools, seed, nrec, length, w, p):
    rng = np.random.default_rng(seed)
    fasta = random_fasta(tmp_prefix("fz") + ".fa", rng, nrecords=nrec, length=length)
    ref_prefix, my_prefix = tmp_prefix("ref"), tmp_prefix("mine")
    ref_tools.run_pfbwt(fasta, ref_prefix, w=w, p=p, sa=1, rssa=1)
    _run_mine(fasta, my_prefix, w, p)
    _diff(ref_prefix, my_prefix, ["bwt", "sa", "ssa", "esa"])


def test_e2e_parity_repetitive(ref_tools):
    """Highly repetitive text: many repeated phrases, big ilists, HARD cases."""
    rng = np.random.default_rng(99)
    unit = bytes(rng.choice(list(b"ACGT"), size=200).tolist()).decode()
    path = tmp_prefix("rep") + ".fa"
    with open(path, "w") as f:
        f.write(">rep\n")
        s = (unit * 40)[:8000]
        for i in range(0, len(s), 70):
            f.write(s[i : i + 70] + "\n")
    ref_prefix, my_prefix = tmp_prefix("ref"), tmp_prefix("mine")
    ref_tools.run_pfbwt(path, ref_prefix, w=10, p=10, sa=1, rssa=1)
    _run_mine(path, my_prefix, 10, 10)
    _diff(ref_prefix, my_prefix, ["bwt", "sa", "ssa", "esa"])


def test_e2e_parity_32bit(ref_tools):
    """32-bit build width (pfbwt-f vs pfbwt-f64): UIntType = uint32."""
    fasta = f"{DATA}/single_chrom.fa"
    ref_prefix, my_prefix = tmp_prefix("ref"), tmp_prefix("mine")
    ref_tools.run_pfbwt(fasta, ref_prefix, w=10, p=100, sa=1, rssa=1, bits=32)
    _run_mine(fasta, my_prefix, 10, 100, dtype=formats.U32)
    _diff(ref_prefix, my_prefix, ["bwt", "sa", "ssa", "esa"])


def test_e2e_bwt_only(ref_tools):
    """No-SA mode exercises the EASY2 multi-word same-char path."""
    rng = np.random.default_rng(21)
    fasta = random_fasta(tmp_prefix("bo") + ".fa", rng, nrecords=2, length=2500)
    ref_prefix, my_prefix = tmp_prefix("ref"), tmp_prefix("mine")
    ref_tools.run_pfbwt(fasta, ref_prefix, w=10, p=5, sa=0, rssa=0)
    _run_mine(fasta, my_prefix, 10, 5, sa=False, rssa=False)
    _diff(ref_prefix, my_prefix, ["bwt"])
