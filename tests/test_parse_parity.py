"""Parse-stage byte parity vs the reference implementation.

Gate for SURVEY.md §7 layer L1: .dict/.occ/.parse/.n/.docs (and the stage-2
.bwlast/.ilist/.bwsai) must be byte-identical to `pfbwt-f64 --parse-only`.
"""

import numpy as np
import pytest

from pfbwtf_tpu.io import formats
from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
from pfbwtf_tpu.pipeline import save_parse_bwt, save_parser

from .ref_fixtures import random_fasta, tmp_prefix

DATA = "/root/reference/tests/data"


def _check_parse_parity(fasta, prefix_ref, prefix_mine, params):
    res = parse_fasta(fasta, params)
    save_parser(res, prefix_mine)
    save_parse_bwt(res, prefix_mine, sa=True)
    exts = ["dict", "occ", "parse", "n", "bwlast", "ilist", "bwsai"]
    if params.store_docs:
        exts.append("docs")
    for ext in exts:
        a = open(f"{prefix_ref}.{ext}", "rb").read()
        b = open(f"{prefix_mine}.{ext}", "rb").read()
        assert a == b, f".{ext} mismatch ({len(a)} vs {len(b)} bytes)"


@pytest.mark.parametrize("w,p", [(10, 100), (10, 10), (4, 5), (16, 50)])
def test_parse_parity_testdata(ref_tools, w, p):
    fasta = f"{DATA}/single_chrom.fa"
    ref_prefix = tmp_prefix("ref")
    my_prefix = tmp_prefix("mine")
    ref_tools.run_parse(fasta, ref_prefix, w=w, p=p, docs=1)
    params = ParserParams(w=w, p=p, get_sai=True, store_docs=True)
    _check_parse_parity(fasta, ref_prefix, my_prefix, params)


def test_parse_parity_multirecord(ref_tools):
    fasta = f"{DATA}/mult_chroms.fa"
    ref_prefix = tmp_prefix("ref")
    my_prefix = tmp_prefix("mine")
    ref_tools.run_parse(fasta, ref_prefix, w=10, p=100, docs=1)
    params = ParserParams(w=10, p=100, get_sai=True, store_docs=True)
    _check_parse_parity(fasta, ref_prefix, my_prefix, params)


@pytest.mark.parametrize("seed,nrec,length,p", [(1, 1, 2000, 20), (2, 3, 1500, 10),
                                                (3, 5, 800, 5), (4, 2, 4000, 100)])
def test_parse_parity_fuzz(ref_tools, seed, nrec, length, p):
    rng = np.random.default_rng(seed)
    fasta = random_fasta(tmp_prefix("fuzz") + ".fa", rng, nrecords=nrec, length=length)
    ref_prefix = tmp_prefix("ref")
    my_prefix = tmp_prefix("mine")
    ref_tools.run_parse(fasta, ref_prefix, w=10, p=p, docs=1)
    params = ParserParams(w=10, p=p, get_sai=True, store_docs=True)
    _check_parse_parity(fasta, ref_prefix, my_prefix, params)


def test_parse_parity_lowercase_and_n(ref_tools):
    """--non-acgt-to-a path: N and lowercase handling (pfparser.hpp:337-344)."""
    rng = np.random.default_rng(7)
    fasta = random_fasta(
        tmp_prefix("ncase") + ".fa", rng, nrecords=2, length=1200,
        alphabet=b"ACGTacgtN",
    )
    ref_prefix = tmp_prefix("ref")
    my_prefix = tmp_prefix("mine")
    ref_tools.run_parse(fasta, ref_prefix, w=10, p=10, ntoa=1, docs=1)
    params = ParserParams(w=10, p=10, get_sai=True, store_docs=True,
                          non_acgt_to_a=True)
    _check_parse_parity(fasta, ref_prefix, my_prefix, params)
