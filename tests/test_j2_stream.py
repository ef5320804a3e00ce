"""Streamed (chunked-scan) J2 vs the monolithic J2: identical state.

_parse_core_stream must produce bit-identical parse state to _parse_core —
same dedup hashes (the forward-prefix F identity), same provisional group
ids, same per-occurrence metadata — for any chunking, including chunk
boundaries that split phrases and m_max windows near overflow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfbwtf_tpu.ops import fused
from pfbwtf_tpu.ops.parse import ParserParams, build_stream

ACGT = np.frombuffer(b"ACGT", np.uint8)


def _state_pair(C, w, p, n_chunks, m_max=None):
    C_len = int(C.shape[0])
    n_b = fused._bucket(max(C_len, 1), 1 << 16)
    chars_p = np.full(n_b, ord("A"), np.uint8)
    chars_p[:C_len] = C
    dev = jax.device_put(chars_p)
    nph_b = fused._bucket(fused.speculative_nphrases(C_len, p))
    mono = jax.jit(
        lambda c, n: fused._parse_core(c, n, w=w, p=p, nph_b=nph_b)
    )(dev, jnp.int64(C_len))
    if m_max is None:
        m_max = fused.speculative_chunk_phrases(
            -(-n_b // n_chunks), p
        )
    stream = jax.jit(
        lambda c, n: fused._parse_core_stream(
            c, n, w=w, p=p, nph_b=nph_b, n_chunks=n_chunks, m_max=m_max
        )
    )(dev, jnp.int64(C_len))
    return mono, stream


def _assert_equal_state(mono, stream):
    names = ["Tp", "parse_ranks", "occs", "dict_start", "dict_len",
             "last", "sai"]
    for name, a, b in zip(names, mono[:-1], stream[:-1]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
    # meta: first four scalars shared; stream adds max-phrases-per-chunk
    np.testing.assert_array_equal(
        np.asarray(mono[-1]), np.asarray(stream[-1])[:4]
    )


@pytest.mark.parametrize("n_chunks", [1, 3, 7])
def test_stream_matches_monolithic(n_chunks):
    rng = np.random.default_rng(77)
    seq = rng.choice(ACGT, size=50_000)
    C, _, _ = build_stream([("s", seq)], ParserParams(w=4, p=10))
    mono, stream = _state_pair(C, 4, 10, n_chunks)
    _assert_equal_state(mono, stream)


def test_stream_multi_record():
    rng = np.random.default_rng(78)
    recs = [("a", rng.choice(ACGT, size=9000)),
            ("b", rng.choice(ACGT, size=4000)),
            ("c", rng.choice(ACGT, size=13000))]
    C, _, _ = build_stream(recs, ParserParams(w=6, p=25))
    mono, stream = _state_pair(C, 6, 25, 5)
    _assert_equal_state(mono, stream)


def test_stream_overflow_rerun():
    """m_max window overflow is detected via meta[4] and the driver path
    re-runs at the exact window."""
    rng = np.random.default_rng(79)
    seq = rng.choice(ACGT, size=30_000)
    C, _, _ = build_stream([("s", seq)], ParserParams(w=4, p=10))
    # tiny m_max: meta[4] must report the true per-chunk max so the
    # driver can size the re-run
    mono, stream = _state_pair(C, 4, 10, 4, m_max=8)
    m_over = int(np.asarray(stream[-1])[4])
    assert m_over > 8
    # the driver entry point hides the re-run
    C_len = int(C.shape[0])
    n_b = fused._bucket(max(C_len, 1), 1 << 16)
    chars_p = np.full(n_b, ord("A"), np.uint8)
    chars_p[:C_len] = C
    state, ncuts, D, dict_total, max_len = fused.run_parse_stream(
        jax.device_put(chars_p), C_len, 4, 10,
        fused._bucket(fused.speculative_nphrases(C_len, 10)),
        chunk_target=n_b // 4,
    )
    _assert_equal_state(mono, state)


def test_stream_end_to_end_bwt():
    """Full fused pipeline parity when J2 runs streamed."""
    from pfbwtf_tpu.ops.fused_stream import pfbwt_fused_stream
    import io

    rng = np.random.default_rng(80)
    seq = rng.choice(ACGT, size=40_000)
    C, _, _ = build_stream([("s", seq)], ParserParams(w=4, p=10))

    bwt_a, sa_a = io.BytesIO(), io.BytesIO()
    pfbwt_fused_stream(C, 4, 10, bwt_fp=bwt_a, sa_fp=sa_a)
    bwt_b, sa_b = io.BytesIO(), io.BytesIO()
    import os
    os.environ["PFBWT_J2_STREAM"] = "1"
    os.environ["PFBWT_J2_CHUNK"] = str(1 << 14)
    try:
        pfbwt_fused_stream(C, 4, 10, bwt_fp=bwt_b, sa_fp=sa_b)
    finally:
        del os.environ["PFBWT_J2_STREAM"]
        del os.environ["PFBWT_J2_CHUNK"]
    assert bwt_a.getvalue() == bwt_b.getvalue()
    assert sa_a.getvalue() == sa_b.getvalue()
