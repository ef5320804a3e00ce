"""Streamed fused pipeline (ops/fused_stream.py) vs the staged host path.

The streamed path is the device port of the out-of-core decomposition
(ops/bwt_mmap.py): tiny chunk targets here force MANY group-aligned
chunks, exercising boundary alignment, empty chunks, zero-count suffix
runs at chunk heads, and the cross-chunk run-length bookkeeping.
"""

import io

import numpy as np
import pytest

from pfbwtf_tpu.ops.bwt import assemble_bwt
from pfbwtf_tpu.ops.fused_stream import pfbwt_fused_stream
from pfbwtf_tpu.ops.parse import ParserParams, build_stream, parse_records
from pfbwtf_tpu.ops.parse_bwt import bwt_of_parse

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _host_reference(records, w, p):
    params = ParserParams(w=w, p=p, get_sai=True)
    res = parse_records(records, params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    return assemble_bwt(
        res.dict_flat(), w, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n, want_sa=True, want_rssa=True,
    )


def _check(records, w, p, chunk_target):
    want = _host_reference(records, w, p)
    C, _, _ = build_stream(records, ParserParams(w=w, p=p))
    bwt_fp, sa_fp = io.BytesIO(), io.BytesIO()
    nruns, total, _ = pfbwt_fused_stream(
        C, w, p, bwt_fp=bwt_fp, sa_fp=sa_fp, chunk_target=chunk_target
    )
    assert total == want.bwt.shape[0]
    assert bwt_fp.getvalue() == want.bwt.tobytes()
    got_sa = np.frombuffer(sa_fp.getvalue(), dtype="<u8")
    assert np.array_equal(got_sa, want.sa)
    assert nruns == want.nruns


def test_stream_many_chunks():
    rng = np.random.default_rng(21)
    seq = rng.choice(ACGT, size=6000)
    # ~1 MB of emissions split into ~24 chunks of <=256 each
    _check([("s", seq)], w=4, p=10, chunk_target=256)


def test_stream_single_chunk():
    rng = np.random.default_rng(22)
    seq = rng.choice(ACGT, size=3000)
    _check([("s", seq)], w=4, p=10, chunk_target=1 << 24)


def test_stream_repetitive_oversized_groups():
    """Tiled input -> huge equality groups; a group larger than
    chunk_target must be taken whole (chunk_b sized from the device-
    reported max chunk)."""
    rng = np.random.default_rng(23)
    unit = rng.choice(ACGT, size=500)
    seq = np.tile(unit, 20)
    muts = rng.integers(0, seq.size, size=25)
    seq[muts] = ACGT[rng.integers(0, 4, size=25)]
    _check([("r", seq)], w=4, p=12, chunk_target=64)


def test_stream_multi_record():
    rng = np.random.default_rng(24)
    recs = [
        ("a", rng.choice(ACGT, size=2500)),
        ("b", rng.choice(ACGT, size=1500)),
    ]
    _check(recs, w=4, p=8, chunk_target=512)


def test_stream_checksum_only_mode():
    rng = np.random.default_rng(25)
    seq = rng.choice(ACGT, size=4000)
    C, _, _ = build_stream([("s", seq)], ParserParams(w=4, p=10))
    nruns, total, ck = pfbwt_fused_stream(C, 4, 10, chunk_target=512)
    assert nruns is None
    want = _host_reference([("s", seq)], 4, 10)
    sa_fixed = want.sa.copy().astype(np.uint64)
    want_ck = int(
        (want.bwt.astype(np.uint64).sum() + sa_fixed.sum())
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    )
    assert total == want.bwt.shape[0]
    assert ck == want_ck


def test_stream_max_chunks_exceeded_dies():
    from pfbwtf_tpu.utils.errors import PfbwtError

    rng = np.random.default_rng(26)
    seq = rng.choice(ACGT, size=6000)
    C, _, _ = build_stream([("s", seq)], ParserParams(w=4, p=10))
    with pytest.raises(PfbwtError, match="more than"):
        pfbwt_fused_stream(C, 4, 10, chunk_target=16, max_chunks=4)


def test_cli_fused_mmap_matches_fused(tmp_path):
    """pfbwt_f --fused -m (streamed) == --fused (monolithic), byte-for-byte
    incl. .ssa/.esa."""
    from pfbwtf_tpu.cli.pfbwt_f import main

    rng = np.random.default_rng(27)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    fa = tmp_path / "in.fa"
    fa.write_text(f">r\n{seq}\n")
    a = str(tmp_path / "mono")
    b = str(tmp_path / "stream")
    assert main([str(fa), "-o", a, "-s", "-r", "-p", "20", "--fused"]) == 0
    assert main([str(fa), "-o", b, "-s", "-r", "-p", "20", "--fused",
                 "-m"]) == 0
    for ext in (".bwt", ".sa", ".ssa", ".esa"):
        assert (
            open(a + ext, "rb").read() == open(b + ext, "rb").read()
        ), ext
