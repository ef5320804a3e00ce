"""Exact distributed dictionary union on the virtual 8-device CPU mesh.

The collective sample-sort (all_to_all route + local lex sort + global rank
scan) must reproduce the host dedup/rank bit-for-bit — this is the
multi-chip analogue of merge_pfp's operator+= fold (src/merge_pfp.cpp:97-152)
and the correctness harness for pod-scale parsing.
"""

import numpy as np
import pytest

from pfbwtf_tpu.ops.parse import ParserParams, parse_records
from pfbwtf_tpu.parallel.dict_union import (
    distributed_parse_records,
    distributed_rank_rows,
)
from pfbwtf_tpu.parallel.sharded import make_parse_mesh


def _host_rank_rows(cols: np.ndarray):
    """Oracle: dense 1-based lexicographic group ranks via np.lexsort."""
    N, ncols = cols.shape
    order = np.lexsort(tuple(cols[:, j] for j in range(ncols - 1, -1, -1)))
    s = cols[order]
    head = np.ones(N, dtype=bool)
    head[1:] = np.any(s[1:] != s[:-1], axis=1)
    gid = np.cumsum(head)
    ranks = np.empty(N, dtype=np.int64)
    ranks[order] = gid
    return ranks


@pytest.mark.parametrize("N,ncols,card", [(5000, 3, 50), (777, 1, 777),
                                          (64, 5, 3), (3, 2, 2)])
def test_distributed_rank_rows_matches_host(rng, N, ncols, card):
    pool = rng.integers(0, np.iinfo(np.int64).max, size=(card, ncols))
    cols = pool[rng.integers(0, card, size=N)].astype(np.uint64)
    # keep first bytes below 0xFF (the device sort's padding sentinel
    # assumption for phrase rows holds by construction in the real pipeline)
    cols[:, 0] >>= np.uint64(8)
    mesh = make_parse_mesh()
    got, D = distributed_rank_rows(cols, mesh)
    want = _host_rank_rows(cols)
    assert np.array_equal(got, want)
    assert D == int(want.max())


@pytest.mark.parametrize("n,w,p", [(60_000, 10, 17), (9_999, 4, 5)])
def test_distributed_parse_equals_host_parse(rng, n, w, p):
    chars = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    records = [("chr1", chars[: n // 2]), ("chr2", chars[n // 2:])]
    params = ParserParams(w=w, p=p, store_docs=True)
    mesh = make_parse_mesh()
    got = distributed_parse_records(records, params, mesh)
    want = parse_records(records, params)
    assert got.phrases == want.phrases
    assert np.array_equal(got.occs, want.occs)
    assert np.array_equal(got.parse_ranks, want.parse_ranks)
    assert np.array_equal(got.last, want.last)
    assert np.array_equal(got.sai, want.sai)
    assert got.pos == want.pos and got.n == want.n
    assert got.doc_names == want.doc_names
    assert got.doc_starts == want.doc_starts


def test_distributed_parse_tiny_input(rng):
    """Fewer phrases than devices: empty shards must not derail the
    splitter agreement or the global rank scan."""
    chars = rng.choice(list(b"ACGT"), size=300).astype(np.uint8)
    params = ParserParams(w=4, p=40)
    mesh = make_parse_mesh()
    got = distributed_parse_records([("c", chars)], params, mesh)
    want = parse_records([("c", chars)], params)
    assert got.phrases == want.phrases
    assert np.array_equal(got.parse_ranks, want.parse_ranks)
    assert np.array_equal(got.occs, want.occs)


def test_device_dict_impl_matches_host(rng, monkeypatch):
    """PFBWT_DICT_IMPL=jax (on-device chunk-row sort) must produce the
    identical parse to the host dedup/rank."""
    chars = rng.choice(list(b"ACGT"), size=20_000).astype(np.uint8)
    params = ParserParams(w=8, p=13)
    want = parse_records([("c", chars)], params)
    monkeypatch.setenv("PFBWT_DICT_IMPL", "jax")
    got = parse_records([("c", chars)], params)
    assert got.phrases == want.phrases
    assert np.array_equal(got.occs, want.occs)
    assert np.array_equal(got.parse_ranks, want.parse_ranks)


def test_mesh_parse_long_phrase_fallback(rng):
    """Phrases longer than a shard exceed the single-neighbor halo: the
    exact host fallback must kick in and still match the host parse."""
    chars = rng.choice(list(b"ACGT"), size=4000).astype(np.uint8)
    params = ParserParams(w=8, p=600)  # expected gap ~ p >> shard width
    mesh = make_parse_mesh()
    got = distributed_parse_records([("c", chars)], params, mesh)
    want = parse_records([("c", chars)], params)
    assert got.phrases == want.phrases
    assert np.array_equal(got.parse_ranks, want.parse_ranks)
    assert np.array_equal(got.occs, want.occs)
    assert np.array_equal(got.sai, want.sai)


def test_mesh_parse_empty_shards(rng):
    """Tiny input: most devices hold only padding; counts/halo must cope."""
    chars = rng.choice(list(b"ACGT"), size=300).astype(np.uint8)
    params = ParserParams(w=4, p=5)
    mesh = make_parse_mesh()
    got = distributed_parse_records([("c", chars)], params, mesh)
    want = parse_records([("c", chars)], params)
    assert got.phrases == want.phrases
    assert np.array_equal(got.parse_ranks, want.parse_ranks)
