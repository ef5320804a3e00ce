"""Radix argsort (ops/radix.py) — correctness vs numpy/lax, and end-to-end
equivalence of the PFBWT_SORT_IMPL=radix engine with the default lax path."""

import numpy as np
import pytest

from pfbwtf_tpu.ops.radix import (
    key_bits,
    radix_argsort_pair,
    radix_argsort_u32,
)


@pytest.mark.parametrize("n", [1, 7, 256, 5000])
@pytest.mark.parametrize("bits", [1, 2, 4])
def test_radix_u32_matches_stable_argsort(n, bits):
    rng = np.random.default_rng(n * 31 + bits)
    keys = rng.integers(0, max(n // 2, 2), size=n).astype(np.int32)
    got = np.asarray(radix_argsort_u32(keys, nbits=key_bits(n), bits=bits))
    want = np.argsort(keys, kind="stable")
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n", [1, 64, 4097])
def test_radix_pair_matches_lexsort(n):
    rng = np.random.default_rng(n)
    hi = rng.integers(0, n + 1, size=n).astype(np.int32)
    lo = rng.integers(0, n + 1, size=n).astype(np.int32)
    nb = key_bits(n)
    got = np.asarray(radix_argsort_pair(hi, lo, nbits_hi=nb, nbits_lo=nb))
    want = np.lexsort((np.arange(n), lo, hi))
    assert np.array_equal(got, want)


def test_radix_u32_all_equal_keys_is_identity():
    keys = np.zeros(100, dtype=np.int32)
    got = np.asarray(radix_argsort_u32(keys, nbits=7))
    assert np.array_equal(got, np.arange(100))


def test_doubling_radix_matches_lax():
    from pfbwtf_tpu.ops.suffix import _doubling_jax

    rng = np.random.default_rng(9)
    for n in (5, 300, 2048):
        seq = rng.integers(1, 20, size=n).astype(np.int64)
        seq[-1] = 0  # unique minimum terminator
        o_lax, r_lax = (np.asarray(x) for x in _doubling_jax(seq, impl="lax"))
        o_rad, r_rad = (
            np.asarray(x) for x in _doubling_jax(seq, impl="radix")
        )
        assert np.array_equal(o_lax, o_rad)
        assert np.array_equal(r_lax, r_rad)


def test_pipeline_radix_byte_parity(monkeypatch):
    """Whole fused pipeline under PFBWT_SORT_IMPL=radix reproduces the
    lax-path BWT/SA exactly."""
    from pfbwtf_tpu.ops.fused import pfbwt_fused_records
    from pfbwtf_tpu.ops.parse import ParserParams

    rng = np.random.default_rng(77)
    chars = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, size=6000)
    ]
    records = [("r1", chars[:2500]), ("r2", chars[2500:])]
    params = ParserParams(w=4, p=10, get_sai=True)

    monkeypatch.delenv("PFBWT_SORT_IMPL", raising=False)
    base, _ = pfbwt_fused_records(records, params, want_sa=True)
    monkeypatch.setenv("PFBWT_SORT_IMPL", "radix")
    rad, _ = pfbwt_fused_records(records, params, want_sa=True)
    assert np.array_equal(base.bwt, rad.bwt)
    assert np.array_equal(base.sa, rad.sa)
    assert base.nruns == rad.nruns


def test_parse_bwt_radix_matches(monkeypatch):
    from pfbwtf_tpu.ops import parse_bwt as pb

    rng = np.random.default_rng(3)
    n = 500
    ranks = rng.integers(1, 40, size=n).astype(np.int64)
    last = rng.integers(65, 91, size=n).astype(np.uint8)
    sai = np.cumsum(rng.integers(1, 9, size=n)).astype(np.uint64)

    monkeypatch.delenv("PFBWT_SORT_IMPL", raising=False)
    a = pb.bwt_of_parse_device(ranks, last, sai)
    monkeypatch.setenv("PFBWT_SORT_IMPL", "radix")
    b = pb.bwt_of_parse_device(ranks, last, sai)
    assert np.array_equal(a.bwlast, b.bwlast)
    assert np.array_equal(a.ilist, b.ilist)
    assert np.array_equal(a.bwsai, b.bwsai)


def test_cumsum_u64_limb_decomposition():
    """cumsum_u64_jax (no 64-bit scans — TPU scoped-VMEM workaround) is
    bit-identical to the numpy uint64 cumsum, both directions, across
    block-boundary sizes."""
    import jax.numpy as jnp

    from pfbwtf_tpu.ops.suffix import cumsum_u64_jax

    rng = np.random.default_rng(42)
    for n in (1, 7, (1 << 15) - 1, 1 << 15, (1 << 15) + 1, 99991):
        x = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * np.uint64(7)
        for rev in (False, True):
            got = np.asarray(cumsum_u64_jax(jnp.asarray(x), reverse=rev))
            want = (
                x[::-1].cumsum(dtype=np.uint64)[::-1]
                if rev
                else x.cumsum(dtype=np.uint64)
            )
            assert np.array_equal(got, want), (n, rev)
