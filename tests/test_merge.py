"""Parse-merge algebra: shard-merge == whole-parse, and byte parity vs the
reference merge_pfp binary.  This is the correctness harness for the
collective merge that the multi-host path builds on (SURVEY.md §4 end,
test_parser.cpp:188-234 operator+= algebra)."""

import os

import numpy as np
import pytest

from pfbwtf_tpu.io import formats
from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
from pfbwtf_tpu.parallel.merge import merge_parse_prefixes, reconstruct_text
from pfbwtf_tpu.pipeline import save_parse_bwt, save_parser

from .ref_fixtures import random_fasta, tmp_prefix


def _write_shards(rng, nshards, length, dirprefix):
    paths = []
    for i in range(nshards):
        paths.append(
            random_fasta(
                f"{dirprefix}.shard{i}.fa", rng,
                nrecords=rng.integers(1, 4), length=length,
            )
        )
    return paths


def test_merge_equals_whole_parse(rng):
    """Parsing shards separately then merging == parsing the concatenation
    (the operator+= associativity property)."""
    base = tmp_prefix("alg")
    shards = _write_shards(rng, 4, 900, base)
    params = ParserParams(w=10, p=10, get_sai=True, store_docs=False)
    # whole: records of all shards concatenated
    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops.parse import parse_records

    all_records = [r for s in shards for r in read_fasta_bytes(s)]
    whole = parse_records(all_records, params)
    # sharded: save each shard's parse, then merge from files
    prefixes = []
    for i, s in enumerate(shards):
        res = parse_fasta(s, params)
        prefix = f"{base}.p{i}"
        save_parser(res, prefix)
        prefixes.append(prefix)
    merged = merge_parse_prefixes(prefixes, params)
    assert merged.phrases == whole.phrases
    assert np.array_equal(merged.occs, whole.occs)
    assert np.array_equal(merged.parse_ranks, whole.parse_ranks)
    assert np.array_equal(merged.last, whole.last)
    assert np.array_equal(merged.sai, whole.sai)
    assert merged.n == whole.n


def test_reconstruct_text_roundtrip(rng):
    base = tmp_prefix("rt")
    fa = random_fasta(base + ".fa", rng, nrecords=2, length=1500)
    params = ParserParams(w=10, p=10, get_sai=True)
    res = parse_fasta(fa, params)
    prefix = base + ".p"
    save_parser(res, prefix)
    C, _, _ = reconstruct_text(prefix, 10)
    from pfbwtf_tpu.ops.parse import build_stream
    from pfbwtf_tpu.io.fasta import read_fasta_bytes

    C0, _, _ = build_stream(read_fasta_bytes(fa), params)
    assert np.array_equal(C, C0)


def test_merge_parity_vs_reference(ref_tools, rng):
    """Byte parity of merged .dict/.occ/.parse/.n/.bwlast/.ilist/.bwsai vs
    the reference merge_pfp binary."""
    base = tmp_prefix("mp")
    shards = _write_shards(rng, 3, 1200, base)
    params = ParserParams(w=10, p=10, get_sai=True)
    prefixes = []
    for i, s in enumerate(shards):
        prefix = f"{base}.p{i}"
        ref_tools.run_parse(s, prefix, w=10, p=10)
        prefixes.append(prefix)
    ref_out = base + ".refmerge"
    my_out = base + ".mymerge"
    ref_tools.run_merge_pfp(prefixes, ref_out, w=10, p=10, sai=True,
                            parse_bwt=True)
    merged = merge_parse_prefixes(prefixes, params)
    save_parser(merged, my_out)
    save_parse_bwt(merged, my_out, sa=True)
    for ext in ["dict", "occ", "parse", "n", "bwlast", "ilist", "bwsai"]:
        a = open(f"{ref_out}.{ext}", "rb").read()
        b = open(f"{my_out}.{ext}", "rb").read()
        assert a == b, f".{ext} mismatch ({len(a)} vs {len(b)})"


def test_merge_from_fasta_fallback(ref_tools, rng):
    """load_or_generate semantics: prefixes without parse files are treated
    as FASTA paths (pfbwt_io.hpp:270-285)."""
    base = tmp_prefix("fb")
    shards = _write_shards(rng, 2, 800, base)
    params = ParserParams(w=10, p=10, get_sai=True)
    # shard 0 pre-parsed, shard 1 raw fasta
    prefix0 = f"{base}.p0"
    ref_tools.run_parse(shards[0], prefix0, w=10, p=10)
    ref_out = base + ".refmerge"
    my_out = base + ".mymerge"
    ref_tools.run_merge_pfp([prefix0, shards[1]], ref_out, w=10, p=10)
    merged = merge_parse_prefixes([prefix0, shards[1]], params)
    save_parser(merged, my_out)
    save_parse_bwt(merged, my_out, sa=True)
    for ext in ["dict", "occ", "parse", "n", "bwlast", "ilist"]:
        a = open(f"{ref_out}.{ext}", "rb").read()
        b = open(f"{my_out}.{ext}", "rb").read()
        assert a == b, f".{ext} mismatch"


def test_pod_parse_equals_single_shot(ref_tools, rng):
    """Split -> parallel shard parse -> merge == single-shot parse, and byte
    parity with the reference on the merged checkpoint files."""
    from pfbwtf_tpu.parallel.driver import pod_parse

    base = tmp_prefix("pod")
    fa = random_fasta(base + ".fa", rng, nrecords=8, length=900)
    params = ParserParams(w=10, p=10, get_sai=True)
    pod_parse(fa, base + ".pod", params, nshards=4, workers=2)
    ref_prefix = base + ".ref"
    ref_tools.run_pfbwt(fa, ref_prefix, w=10, p=10, sa=1, rssa=0)
    for ext in ["dict", "occ", "parse", "n", "bwlast", "ilist", "bwsai"]:
        a = open(f"{ref_prefix}.{ext}", "rb").read()
        b = open(f"{base}.pod.{ext}", "rb").read()
        assert a == b, f".{ext} mismatch"
    # and the merged checkpoint feeds --pfbwt-only to the same final BWT
    from pfbwtf_tpu.pipeline import PfbwtConfig, run_pfbwt

    run_pfbwt(PfbwtConfig(prefix=base + ".pod", w=10, sa=True))
    assert (
        open(base + ".pod.bwt", "rb").read()
        == open(ref_prefix + ".bwt", "rb").read()
    )
    assert (
        open(base + ".pod.sa", "rb").read()
        == open(ref_prefix + ".sa", "rb").read()
    )
