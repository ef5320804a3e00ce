"""Chunked (bounded-memory) parse == whole-stream parse, for any chunk size
(the out-of-core mmap-mode analogue)."""

import numpy as np
import pytest

from pfbwtf_tpu.ops.chunked import chunked_cut_positions, parse_fasta_chunked
from pfbwtf_tpu.ops.hash import hash_scan_np
from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
from pfbwtf_tpu.utils.tables import NTOA_TABLE

from .ref_fixtures import random_fasta, tmp_prefix


@pytest.mark.parametrize("chunk", [1 << 10, 1 << 12, 3000])
def test_chunked_cuts_match_stream(rng, chunk):
    chars = rng.choice(list(b"ACGT"), size=50_000).astype(np.uint8)
    codes = NTOA_TABLE[chars]
    _, _, cut = hash_scan_np(chars, 10, 17)
    expect = np.flatnonzero(cut)

    def pieces():
        # deliver in awkward piece sizes to exercise re-blocking
        i = 0
        while i < codes.shape[0]:
            take = int(rng.integers(1, 7000))
            yield codes[i : i + take]
            i += take

    got = chunked_cut_positions(pieces(), 10, 17, chunk=chunk)
    assert np.array_equal(got, expect)


def test_parse_fasta_chunked_equals_whole(rng):
    fa = random_fasta(tmp_prefix("ch") + ".fa", rng, nrecords=2, length=4000)
    params = ParserParams(w=10, p=10, get_sai=True)
    whole = parse_fasta(fa, params)
    chunked = parse_fasta_chunked(fa, params, chunk=1 << 12)
    assert chunked.phrases == whole.phrases
    assert np.array_equal(chunked.parse_ranks, whole.parse_ranks)
    assert np.array_equal(chunked.occs, whole.occs)
    assert np.array_equal(chunked.sai, whole.sai)


def test_iter_fasta_records_matches_slurp(tmp_path, rng):
    """Streaming record iterator == slurp reader, including tiny blocks
    (boundary straddling), gzip input, CRLF and multi-line records."""
    import gzip as _gzip

    from pfbwtf_tpu.io.fasta import iter_fasta_records, read_fasta_bytes

    seqs = ["".join(rng.choice(list("ACGT"), size=int(n)))
            for n in rng.integers(10, 400, size=7)]
    text = ""
    for i, s in enumerate(seqs):
        lines = [s[j:j + 37] for j in range(0, len(s), 37)]
        text += f">rec{i} extra comment\r\n" + "\r\n".join(lines) + "\n"
    fa = tmp_path / "s.fa"
    fa.write_text(text)
    gz = tmp_path / "s.fa.gz"
    gz.write_bytes(_gzip.compress(text.encode()))

    want = read_fasta_bytes(str(fa))
    for path, block in ((fa, 64), (fa, 8 << 20), (gz, 128)):
        got = list(iter_fasta_records(str(path), block=block))
        assert [n for n, _ in got] == [n for n, _ in want]
        for (gn, gs), (wn, ws) in zip(got, want):
            assert np.array_equal(gs, ws), gn


def test_streamed_parse_with_docs(tmp_path, rng):
    from pfbwtf_tpu.ops.chunked import parse_fasta_chunked
    from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta

    seq = "".join(rng.choice(list("ACGT"), size=9000))
    fa = tmp_path / "d.fa"
    fa.write_text(f">a\n{seq[:4000]}\n>b\n{seq[4000:]}\n")
    params = ParserParams(w=6, p=11, get_sai=True, store_docs=True)
    want = parse_fasta(str(fa), params)
    got = parse_fasta_chunked(str(fa), params, chunk=1 << 12)
    assert got.phrases == want.phrases
    assert np.array_equal(got.occs, want.occs)
    assert np.array_equal(got.parse_ranks, want.parse_ranks)
    assert np.array_equal(got.last, want.last)
    assert np.array_equal(got.sai, want.sai)
    assert got.doc_names == want.doc_names
    assert got.doc_starts == want.doc_starts
    assert got.pos == want.pos and got.nseqs == want.nseqs


def test_chunked_substring_hashes_match_oneshot():
    """The bounded-memory hash path is bit-identical to the one-shot form
    (which materializes 24 bytes/char and is capped at _HASH_CHUNK_LIMIT)."""
    import numpy as np

    from pfbwtf_tpu.ops import parse as P

    rng = np.random.default_rng(123)
    T = rng.integers(0, 256, size=50000, dtype=np.uint8)
    starts = np.sort(
        rng.choice(40000, size=300, replace=False)
    ).astype(np.int64)
    lens = np.minimum(
        rng.integers(1, 3000, size=300), T.shape[0] - starts
    ).astype(np.int64)
    for base in (P._HB1, P._HB2):
        got = P._substring_hashes_chunked(T, starts, lens, base, chunk=4096)
        want = P._substring_hashes(T, starts, lens, base)
        assert np.array_equal(got, want)


def test_chunked_parse_uses_host_dedup(monkeypatch):
    """PFBWT_DICT_IMPL=jax must NOT route the bounded-memory chunked parse
    through the device row build (O(nphrases*maxlen) RAM)."""
    import numpy as np

    from pfbwtf_tpu.ops import chunked as C
    from pfbwtf_tpu.ops.parse import ParserParams

    monkeypatch.setenv("PFBWT_DICT_IMPL", "jax")
    called = {}
    import pfbwtf_tpu.parallel.dict_union as du

    def boom(*a, **k):
        called["device"] = True
        raise AssertionError("device dedup used in bounded-memory path")

    monkeypatch.setattr(du, "dedup_rank_device", boom)
    rng = np.random.default_rng(7)
    fa = tmp_prefix("chunkhost") + ".fa"
    with open(fa, "wb") as f:
        f.write(b">r\n")
        f.write(bytes(rng.choice(list(b"ACGT"), size=5000).astype(np.uint8)))
        f.write(b"\n")
    res = C.parse_fasta_chunked(fa, ParserParams(w=4, p=10), chunk=1 << 12)
    assert res.parse_ranks.size > 0 and "device" not in called
