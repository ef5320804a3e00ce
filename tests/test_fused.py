"""Fused HBM-chained pipeline vs the staged host path (which is itself
byte-parity-proven against the reference binaries in test_bwt_parity.py).

Every comparison covers .bwt bytes, full SA, run count, and the .ssa/.esa
run-length samples.
"""

import numpy as np
import pytest

from pfbwtf_tpu.ops.bwt import assemble_bwt
from pfbwtf_tpu.ops.fused import pfbwt_fused_records
from pfbwtf_tpu.ops.parse import ParserParams, parse_records
from pfbwtf_tpu.ops.parse_bwt import bwt_of_parse


def _host_reference(records, w, p):
    params = ParserParams(w=w, p=p, get_sai=True)
    res = parse_records(records, params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    return assemble_bwt(
        res.dict_flat(), w, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n, want_sa=True, want_rssa=True,
    )


def _check(records, w, p):
    want = _host_reference(records, w, p)
    got, _ = pfbwt_fused_records(
        records, ParserParams(w=w, p=p), want_sa=True, want_rssa=True
    )
    assert got.bwt.tobytes() == want.bwt.tobytes()
    assert np.array_equal(got.sa, want.sa)
    assert got.nruns == want.nruns
    assert np.array_equal(got.ssa, want.ssa)
    assert np.array_equal(got.esa, want.esa)


ACGT = np.frombuffer(b"ACGT", np.uint8)


def test_fused_random():
    rng = np.random.default_rng(11)
    seq = rng.choice(ACGT, size=6000)
    _check([("s", seq)], w=4, p=10)


def test_fused_acgt3_keys(monkeypatch):
    """Opt-in 3-bit packed dict keys (k0=16 + fingerprint captures):
    byte-identical output to the default byte-key path."""
    monkeypatch.setenv("PFBWT_DICT_KEYS", "acgt3")
    rng = np.random.default_rng(21)
    seq = rng.choice(ACGT, size=7000)
    _check([("s", seq)], w=4, p=10)


def test_fused_subset_doubling(monkeypatch):
    """PFBWT_DBL_SUBSET=4 (two-phase subset-refinement schedule, an
    opt-in measured wash on v5e) must agree with the default full-width
    loop."""
    monkeypatch.setenv("PFBWT_DBL_SUBSET", "4")
    rng = np.random.default_rng(22)
    seq = rng.choice(ACGT, size=7000)
    _check([("s", seq)], w=4, p=10)


def test_fused_multi_record():
    rng = np.random.default_rng(12)
    recs = [
        ("a", rng.choice(ACGT, size=2500)),
        ("b", rng.choice(ACGT, size=1700)),
        ("c", rng.choice(ACGT, size=900)),
    ]
    _check(recs, w=4, p=8)


def test_fused_repetitive():
    """Repeats -> duplicate phrases, big ilists, HARD cases, long phrases."""
    rng = np.random.default_rng(13)
    unit = rng.choice(ACGT, size=800)
    seq = np.tile(unit, 12)
    muts = rng.integers(0, seq.size, size=30)
    seq[muts] = ACGT[rng.integers(0, 4, size=30)]
    _check([("r", seq)], w=4, p=12)


def test_fused_default_params():
    rng = np.random.default_rng(14)
    seq = rng.choice(ACGT, size=30000)
    _check([("s", seq)], w=10, p=100)


def test_fused_bucketed_shapes_reused():
    """Different sizes in the same bucket reuse compiled programs and stay
    exact (padding independence)."""
    rng = np.random.default_rng(15)
    for size in (4000, 4100, 5000):
        seq = rng.choice(ACGT, size=size)
        _check([("s", seq)], w=4, p=10)


def test_fused_single_phrase_dies():
    from pfbwtf_tpu.utils.errors import PfbwtError

    seq = np.full(50, ord("A"), np.uint8)
    with pytest.raises(PfbwtError, match="smaller p"):
        pfbwt_fused_records([("s", seq)], ParserParams(w=4, p=(1 << 20) - 1))


def test_fused_nofetch_checksum():
    rng = np.random.default_rng(16)
    seq = rng.choice(ACGT, size=4000)
    (bwt_d, sa_d), checksum = pfbwt_fused_records(
        [("s", seq)], ParserParams(w=4, p=10), fetch=False
    )
    want = _host_reference([("s", seq)], 4, 10)
    total = want.bwt.shape[0]
    got_ck = int(np.asarray(bwt_d)[:total].astype(np.uint64).sum())
    sa_got = np.asarray(sa_d)[:total].astype(np.uint64)
    # checksum covers the padded buffers; recompute over true region + pads
    full_ck = int(
        np.asarray(bwt_d).astype(np.uint64).sum()
        + np.asarray(sa_d).astype(np.uint64).sum()
    ) & 0xFFFFFFFFFFFFFFFF
    assert checksum == full_ck
    assert got_ck == int(want.bwt.astype(np.uint64).sum())
    # sa_d differs from want.sa only at index 0 (host writes n there)
    assert np.array_equal(sa_got[1:], want.sa[1:])


@pytest.mark.parametrize("engine", ["merge", "fill"])
def test_fused_alt_fanout(engine, monkeypatch):
    """Alternate emission engines (merge: sort-based fan-out; fill:
    piecewise-constant per-lane diffs + cumsum, no row gather) are
    byte-identical to the default scatter engine, including zero-count
    corner shapes (duplicate phrases -> many equal-first markers)."""
    monkeypatch.setenv("PFBWT_FANOUT", engine)
    rng = np.random.default_rng(21)
    seq = rng.choice(ACGT, size=6000)
    _check([("s", seq)], w=4, p=10)
    unit = rng.choice(ACGT, size=700)
    rep = np.tile(unit, 10)
    muts = rng.integers(0, rep.size, size=25)
    rep[muts] = ACGT[rng.integers(0, 4, size=25)]
    _check([("r", rep)], w=4, p=12)


@pytest.mark.parametrize("engine", ["merge", "fill"])
def test_assemble_alt_fanout(engine, monkeypatch):
    """assemble_bwt_jax with alternate fan-out engines equals the host
    assembly."""
    monkeypatch.setenv("PFBWT_FANOUT", engine)
    from pfbwtf_tpu.ops.bwt_jax import assemble_bwt_jax

    rng = np.random.default_rng(22)
    seq = rng.choice(ACGT, size=5000)
    params = ParserParams(w=4, p=9, get_sai=True)
    res = parse_records([("s", seq)], params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    args = (
        res.dict_flat(), 4, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n,
    )
    want = assemble_bwt(*args, want_sa=True, want_rssa=True)
    got = assemble_bwt_jax(*args, want_sa=True, want_rssa=True)
    assert got.bwt.tobytes() == want.bwt.tobytes()
    assert np.array_equal(got.sa, want.sa)
    assert np.array_equal(got.ssa, want.ssa)
    assert np.array_equal(got.esa, want.esa)


def test_assemble_wide_emission_sort(monkeypatch):
    """PFBWT_EMIT_WIDE=1 forces the wide multi-operand emission sort
    (the branch large shapes take when nsuf_bits + KB + 9 > 63, where a
    packed int64 key would overflow); byte parity with the host path."""
    monkeypatch.setenv("PFBWT_EMIT_WIDE", "1")
    from pfbwtf_tpu.ops.bwt_jax import assemble_bwt_jax

    rng = np.random.default_rng(23)
    seq = rng.choice(ACGT, size=5000)
    params = ParserParams(w=4, p=9, get_sai=True)
    res = parse_records([("s", seq)], params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    args = (
        res.dict_flat(), 4, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n,
    )
    want = assemble_bwt(*args, want_sa=True, want_rssa=True)
    got = assemble_bwt_jax(*args, want_sa=True, want_rssa=True)
    assert got.bwt.tobytes() == want.bwt.tobytes()
    assert np.array_equal(got.sa, want.sa)
    assert np.array_equal(got.ssa, want.ssa)


def test_fill_fanout_ineligible_warns(monkeypatch):
    """Requesting PFBWT_FANOUT=fill when the packed key cannot hold the
    emission bits warns and falls back to scatter (ADVICE r3)."""
    import warnings as _w

    monkeypatch.setenv("PFBWT_FANOUT", "fill")
    monkeypatch.setenv("PFBWT_EMIT_WIDE", "1")  # forces fill ineligible
    from pfbwtf_tpu.ops.bwt_jax import assemble_bwt_jax

    rng = np.random.default_rng(24)
    seq = rng.choice(ACGT, size=3000)
    params = ParserParams(w=4, p=9, get_sai=True)
    res = parse_records([("s", seq)], params)
    pb = bwt_of_parse(res.parse_ranks, res.last, res.sai, get_sai=True)
    args = (
        res.dict_flat(), 4, res.occs.astype(np.int64), pb.bwlast,
        pb.ilist, pb.bwsai, res.n,
    )
    want = assemble_bwt(*args, want_sa=True)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = assemble_bwt_jax(*args, want_sa=True)
    assert any("fill ineligible" in str(x.message) for x in rec)
    assert got.bwt.tobytes() == want.bwt.tobytes()
    assert np.array_equal(got.sa, want.sa)
