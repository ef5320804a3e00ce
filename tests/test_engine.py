"""Engine backend equivalence: the JAX device path must produce outputs
identical to the byte-verified numpy path."""

import numpy as np
import pytest

from pfbwtf_tpu import engine
from pfbwtf_tpu.ops.parse import ParserParams
from pfbwtf_tpu.pipeline import dict_flat_from_phrases

from .ref_fixtures import random_fasta, tmp_prefix


@pytest.fixture(scope="module")
def parsed():
    rng = np.random.default_rng(42)
    fa = random_fasta(tmp_prefix("eng") + ".fa", rng, nrecords=3, length=3000)
    params = ParserParams(w=10, p=10, get_sai=True)
    res_np = engine.parse_fasta(fa, params, backend="numpy")
    return fa, params, res_np


def test_parse_backends_agree(parsed):
    fa, params, res_np = parsed
    res_j = engine.parse_fasta(fa, params, backend="jax")
    assert res_j.phrases == res_np.phrases
    assert np.array_equal(res_j.occs, res_np.occs)
    assert np.array_equal(res_j.parse_ranks, res_np.parse_ranks)
    assert np.array_equal(res_j.last, res_np.last)
    assert np.array_equal(res_j.sai, res_np.sai)


def test_parse_bwt_backends_agree(parsed):
    _, params, res = parsed
    pb_np = engine.parse_bwt(res, backend="numpy")
    pb_j = engine.parse_bwt(res, backend="jax")
    assert np.array_equal(pb_np.bwlast, pb_j.bwlast)
    assert np.array_equal(pb_np.ilist, pb_j.ilist)
    assert np.array_equal(pb_np.bwsai, pb_j.bwsai)


def test_assemble_backends_agree(parsed):
    _, params, res = parsed
    pb = engine.parse_bwt(res, backend="numpy")
    dict_flat = dict_flat_from_phrases(res.phrases)
    kw = dict(want_sa=True, want_rssa=True)
    a = engine.assemble_bwt(
        dict_flat, params.w, res.occs.astype(np.int64), pb.bwlast, pb.ilist,
        pb.bwsai, res.n, backend="numpy", **kw
    )
    b = engine.assemble_bwt(
        dict_flat, params.w, res.occs.astype(np.int64), pb.bwlast, pb.ilist,
        pb.bwsai, res.n, backend="jax", **kw
    )
    assert np.array_equal(a.bwt, b.bwt)
    assert np.array_equal(a.sa, b.sa)
    assert np.array_equal(a.ssa, b.ssa)
    assert np.array_equal(a.esa, b.esa)
    assert a.nruns == b.nruns


def test_assemble_jax_no_sa(parsed):
    _, params, res = parsed
    pb = engine.parse_bwt(res, backend="numpy")
    dict_flat = dict_flat_from_phrases(res.phrases)
    a = engine.assemble_bwt(
        dict_flat, params.w, res.occs.astype(np.int64), pb.bwlast, pb.ilist,
        None, res.n, backend="jax"
    )
    b = engine.assemble_bwt(
        dict_flat, params.w, res.occs.astype(np.int64), pb.bwlast, pb.ilist,
        None, res.n, backend="numpy"
    )
    assert np.array_equal(a.bwt, b.bwt)


def test_bwt_of_parse_device_matches_host(rng):
    """The single-jit device parse-BWT (sentinel-padded doubling SA +
    wrap gathers + stable-argsort ilist) equals the host construction."""
    from pfbwtf_tpu.ops.parse_bwt import bwt_of_parse, bwt_of_parse_device

    for n, k in ((1000, 50), (4097, 7), (17, 5)):
        ranks = rng.integers(1, k + 1, size=n).astype(np.int64)
        last = rng.integers(0, 256, size=n).astype(np.uint8)
        sai = rng.integers(0, 1 << 40, size=n).astype(np.uint64)
        h = bwt_of_parse(ranks, last, sai)
        d = bwt_of_parse_device(ranks, last, sai)
        assert np.array_equal(h.bwlast, d.bwlast), n
        assert np.array_equal(h.ilist, d.ilist), n
        assert np.array_equal(h.bwsai, d.bwsai), n
        assert np.array_equal(h.bwt_sym, d.bwt_sym), n
