"""Byte parity of the FUSED mesh pipeline (parallel/fused_mesh.py) — the
sharded emission-lane architecture — against the host path (itself
reference-parity-proven) on the 8-device CPU mesh."""

import numpy as np
import pytest

from pfbwtf_tpu.ops.bwt import assemble_bwt
from pfbwtf_tpu.ops.parse import ParserParams, parse_records
from pfbwtf_tpu.ops.parse_bwt import bwt_of_parse
from pfbwtf_tpu.parallel.fused_mesh import pfbwt_fused_mesh_records
from pfbwtf_tpu.parallel.sharded import make_parse_mesh

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _host(records, w, p):
    params = ParserParams(w=w, p=p, get_sai=True)
    res = parse_records(records, params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    return assemble_bwt(
        res.dict_flat(), w, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n, want_sa=True, want_rssa=True,
    )


def _mesh(records, w, p, mesh):
    params = ParserParams(w=w, p=p, get_sai=True)
    return pfbwt_fused_mesh_records(
        records, params, mesh, want_sa=True, want_rssa=True
    )


def _assert_equal(mbw, hbw):
    assert mbw.bwt.tobytes() == hbw.bwt.tobytes()
    assert np.array_equal(mbw.sa, hbw.sa)
    assert np.array_equal(mbw.ssa, hbw.ssa)
    assert np.array_equal(mbw.esa, hbw.esa)
    assert mbw.nruns == hbw.nruns


@pytest.mark.parametrize("n,w,p", [(20_000, 10, 17), (6_000, 4, 8)])
def test_fused_mesh_parity_random(rng, n, w, p):
    mesh = make_parse_mesh()
    recs = [("c1", rng.choice(ACGT, size=n // 2)),
            ("c2", rng.choice(ACGT, size=n - n // 2))]
    _assert_equal(_mesh(recs, w, p, mesh), _host(recs, w, p))


def test_fused_mesh_parity_repetitive(rng):
    """Pan-genome-style repeats: duplicate phrases across shards force the
    collective dict union to merge, and deep shared suffixes exercise the
    HARD-case emission ordering."""
    mesh = make_parse_mesh()
    unit = rng.choice(ACGT, size=700)
    recs = []
    for i in range(8):
        hap = unit.copy()
        pos = rng.integers(0, hap.size, size=6)
        hap[pos] = ACGT[rng.integers(0, 4, size=6)]
        recs.append((f"h{i}", hap))
    _assert_equal(_mesh(recs, 4, 11, mesh), _host(recs, 4, 11))


def test_fused_mesh_parity_single_record_small_p(rng):
    """Small p -> dense cuts -> many single-occurrence words; also covers
    the one-record path and odd (non-multiple-of-mesh) lane counts."""
    mesh = make_parse_mesh()
    recs = [("one", rng.choice(ACGT, size=4097))]
    _assert_equal(_mesh(recs, 4, 5, mesh), _host(recs, 4, 5))
