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
