"""Full-pipeline byte parity with stages 2-3 distributed over the 8-device
CPU mesh: collective parse -> distributed parse-BWT -> distributed dict
gSA + emission sort, vs the host path (itself reference-parity-proven)."""

import numpy as np
import pytest

from pfbwtf_tpu.ops.bwt import assemble_bwt
from pfbwtf_tpu.ops.parse import ParserParams, parse_records
from pfbwtf_tpu.ops.parse_bwt import bwt_of_parse
from pfbwtf_tpu.parallel.dict_union import distributed_parse_records
from pfbwtf_tpu.parallel.pfbwt_mesh import mesh_assemble_bwt, mesh_parse_bwt
from pfbwtf_tpu.parallel.sharded import make_parse_mesh

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _full_host(records, w, p):
    params = ParserParams(w=w, p=p, get_sai=True)
    res = parse_records(records, params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    bw = assemble_bwt(
        res.dict_flat(), w, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n, want_sa=True, want_rssa=True,
    )
    return res, pb, bw


def _full_mesh(records, w, p, mesh):
    params = ParserParams(w=w, p=p, get_sai=True)
    res = distributed_parse_records(records, params, mesh)
    pb = mesh_parse_bwt(res.parse_ranks, res.last, res.sai, mesh)
    bw = mesh_assemble_bwt(
        res.dict_flat(), w, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n, mesh, want_sa=True, want_rssa=True,
    )
    return res, pb, bw


@pytest.mark.parametrize("n,w,p", [(20_000, 10, 17), (6_000, 4, 8)])
def test_mesh_full_pipeline_parity(rng, n, w, p):
    mesh = make_parse_mesh()
    recs = [("c1", rng.choice(ACGT, size=n // 2)),
            ("c2", rng.choice(ACGT, size=n - n // 2))]
    hres, hpb, hbw = _full_host(recs, w, p)
    mres, mpb, mbw = _full_mesh(recs, w, p, mesh)
    assert np.array_equal(mpb.bwlast, hpb.bwlast)
    assert np.array_equal(mpb.ilist, hpb.ilist)
    assert np.array_equal(mpb.bwsai, hpb.bwsai)
    assert mbw.bwt.tobytes() == hbw.bwt.tobytes()
    assert np.array_equal(mbw.sa, hbw.sa)
    assert np.array_equal(mbw.ssa, hbw.ssa)
    assert np.array_equal(mbw.esa, hbw.esa)
    assert mbw.nruns == hbw.nruns


def test_mesh_full_pipeline_repetitive(rng):
    """Repeats -> duplicate phrases, shared suffixes, HARD-case ordering."""
    mesh = make_parse_mesh()
    unit = rng.choice(ACGT, size=700)
    seq = np.tile(unit, 10)
    muts = rng.integers(0, seq.size, size=25)
    seq[muts] = ACGT[rng.integers(0, 4, size=25)]
    _, _, hbw = _full_host([("r", seq)], 4, 11)
    _, _, mbw = _full_mesh([("r", seq)], 4, 11, mesh)
    assert mbw.bwt.tobytes() == hbw.bwt.tobytes()
    assert np.array_equal(mbw.sa, hbw.sa)
