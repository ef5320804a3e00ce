"""Native SA-IS kernel vs the doubling oracle — three-way agreement
(native C++ / numpy doubling / naive sort)."""

import numpy as np
import pytest

from pfbwtf_tpu import native
from pfbwtf_tpu.ops import suffix

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def test_sais_int_matches_doubling(rng):
    for n in [1, 2, 3, 10, 100, 5000]:
        seq = np.concatenate((rng.integers(1, 7, size=n), [0]))
        a = suffix.suffix_array_ints_np(seq)
        b = native.suffix_array_ints_native(seq)
        assert np.array_equal(a, b), n


def test_sais_u8_matches_doubling(rng):
    for n in [5, 1000, 20000]:
        text = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
        seq = np.concatenate((text, [0]))
        a = suffix.suffix_array_ints_np(seq.astype(np.int64))
        b = native.suffix_array_u8_native(seq)
        assert np.array_equal(a, b), n


def test_sais_repetitive(rng):
    text = np.tile(rng.choice(list(b"ACGT"), size=20).astype(np.uint8), 500)
    seq = np.concatenate((text, [0]))
    a = suffix.suffix_array_ints_np(seq.astype(np.int64))
    b = native.suffix_array_u8_native(seq)
    assert np.array_equal(a, b)


def test_dict_suffix_sort_native_matches_np():
    from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
    from pfbwtf_tpu.pipeline import dict_flat_from_phrases

    res = parse_fasta(
        "/root/reference/tests/data/mult_chroms.fa", ParserParams(w=10, p=10)
    )
    dict_flat = dict_flat_from_phrases(res.phrases)
    sa_np, _, _, _ = suffix.dict_suffix_sort_np(dict_flat)
    sa_nat, _, _, _ = native.dict_suffix_sort_native(dict_flat)
    assert np.array_equal(sa_np, sa_nat)
