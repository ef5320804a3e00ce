"""Roundtrip tests for the byte-exact format layer (SURVEY.md §5.1)."""

import numpy as np

from pfbwtf_tpu.io import formats
from pfbwtf_tpu.io.fasta import (
    fetch_contig,
    read_fasta,
    read_fasta_bytes,
    write_fai,
)

from .ref_fixtures import tmp_prefix


def test_dict_roundtrip():
    p = tmp_prefix("fmt") + ".dict"
    phrases = [b"ACGT", b"ACGTA", b"TTT"]
    formats.write_dict(p, phrases)
    assert formats.read_dict(p) == phrases
    raw = open(p, "rb").read()
    assert raw == b"ACGT\x01ACGTA\x01TTT\x01\x00"
    flat = formats.read_dict_flat(p)
    assert flat.tolist() == list(raw)


def test_uint_roundtrip():
    p = tmp_prefix("fmt") + ".occ"
    arr = np.array([1, 2, 2**40], dtype=np.uint64)
    formats.write_uint(p, arr, formats.U64)
    assert np.array_equal(formats.read_uint(p, formats.U64), arr)
    arr32 = np.array([3, 5], dtype=np.uint32)
    formats.write_uint(p, arr32, formats.U32)
    assert np.array_equal(formats.read_uint(p, formats.U32), arr32)


def test_parse_ranks_always_u32():
    p = tmp_prefix("fmt") + ".parse"
    formats.write_parse_ranks(p, np.array([1, 2, 3], dtype=np.uint64))
    assert os_size(p) == 12
    assert formats.read_parse_ranks(p).dtype == np.uint32


def os_size(p):
    import os

    return os.path.getsize(p)


def test_n_and_docs_roundtrip():
    base = tmp_prefix("fmt")
    formats.write_n(base + ".n", 12345)
    assert formats.read_n(base + ".n") == 12345
    assert open(base + ".n").read() == "12345\n"
    formats.write_docs(base + ".docs", ["a", "b c"], [0, 10])
    names, starts = formats.read_docs(base + ".docs")
    assert names == ["a", "b c"] and starts == [0, 10]


def test_fasta_reader_kseq_semantics():
    p = tmp_prefix("fa") + ".fa"
    with open(p, "w") as f:
        f.write(">seq1 description here\nACGT\nACG T\n\n>seq2\nTTTT\n")
    recs = read_fasta(p)
    assert recs[0][0] == "seq1"
    assert recs[0][1] == b"ACGTACGT"  # whitespace stripped
    assert recs[1] == ("seq2", b"TTTT")


def test_fasta_gzip():
    import gzip

    p = tmp_prefix("fa") + ".fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">x\nACGTACGT\n")
    recs = read_fasta_bytes(p)
    assert recs[0][0] == "x" and recs[0][1].tobytes() == b"ACGTACGT"


def test_faidx_fetch():
    p = tmp_prefix("fa") + ".fa"
    with open(p, "w") as f:
        f.write(">c1\nACGTACGTAC\nGTACGT\n>c2\nTTTTT\n")
    write_fai(p)
    assert fetch_contig(p, "c1") == b"ACGTACGTACGTACGT"
    assert fetch_contig(p, "c2") == b"TTTTT"
    fai = open(p + ".fai").read().splitlines()
    assert fai[0].split("\t")[0] == "c1"
    assert int(fai[0].split("\t")[1]) == 16
