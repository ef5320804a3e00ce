"""Device-kernel equivalence: the JAX paths must reproduce the numpy
reference paths exactly (which are in turn parity-tested vs the reference)."""

import numpy as np
import pytest

from pfbwtf_tpu.ops import hash as hash_ops
from pfbwtf_tpu.ops import suffix


def test_wang_hash_known_values():
    # oracle: evaluate the published Wang mix in plain Python ints
    def wang_py(key):
        M = (1 << 64) - 1
        key = ((~key & M) + ((key << 21) & M)) & M
        key ^= key >> 24
        key = (key + ((key << 3) & M) + ((key << 8) & M)) & M
        key ^= key >> 14
        key = (key + ((key << 2) & M) + ((key << 4) & M)) & M
        key ^= key >> 28
        key = (key + ((key << 31) & M)) & M
        return key

    keys = np.array([0, 1, 2, 0xDEADBEEF, (1 << 64) - 1, 0x123456789ABCDEF0],
                    dtype=np.uint64)
    expect = np.array([wang_py(int(k)) for k in keys], dtype=np.uint64)
    got = hash_ops.wang_hash_np(keys)
    assert np.array_equal(got, expect)
    got_jax = np.asarray(hash_ops.wang_hash_jax(keys))
    assert np.array_equal(got_jax, expect)


def test_window_kmers_matches_rolling():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=500, dtype=np.uint8)
    w = 10
    km = hash_ops.window_kmers_np(codes, w)
    # rolling oracle
    mask = (1 << (2 * w)) - 1
    k = 0
    for i, c in enumerate(codes):
        k = ((k << 2) | int(c)) & mask
        assert km[i] == k, i
    km_jax = np.asarray(hash_ops.window_kmers_jax(codes, w))
    assert np.array_equal(km, km_jax)


def test_hash_scan_jax_matches_np():
    rng = np.random.default_rng(1)
    chars = rng.choice(list(b"ACGT"), size=4000).astype(np.uint8)
    from pfbwtf_tpu.utils.tables import NTOA_TABLE

    codes = NTOA_TABLE[chars]
    _, h_np, cut_np = hash_ops.hash_scan_np(chars, 10, 17)
    h_j, cut_j = hash_ops.hash_scan_jax(codes, 10, 17)
    assert np.array_equal(h_np, np.asarray(h_j))
    assert np.array_equal(cut_np, np.asarray(cut_j))


def _naive_sa_ints(seq):
    seq = list(seq)
    return sorted(range(len(seq)), key=lambda i: seq[i:])


def test_suffix_array_ints_np_vs_naive():
    rng = np.random.default_rng(2)
    for n in [1, 2, 5, 50, 300]:
        seq = rng.integers(1, 5, size=n).tolist() + [0]
        arr = np.array(seq)
        got = suffix.suffix_array_ints_np(arr)
        assert got.tolist() == _naive_sa_ints(seq)


def test_suffix_array_ints_jax_matches_np():
    rng = np.random.default_rng(3)
    for n in [2, 17, 128, 1000]:
        seq = np.concatenate((rng.integers(1, 6, size=n), [0]))
        a = suffix.suffix_array_ints_np(seq)
        b = np.asarray(suffix.suffix_array_ints_jax(seq))
        assert np.array_equal(a, b), n


def test_dict_suffix_sort_jax_matches_np():
    from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
    from pfbwtf_tpu.pipeline import dict_flat_from_phrases

    res = parse_fasta("/root/reference/tests/data/single_chrom.fa",
                      ParserParams(w=10, p=10))
    dict_flat = dict_flat_from_phrases(res.phrases)
    sa_np, word_np, suf_len, dwords = suffix.dict_suffix_sort_np(dict_flat)
    sa_j, _, word_j, dwords_j = suffix.dict_suffix_sort_jax(dict_flat)
    assert int(dwords_j) == dwords
    assert np.array_equal(word_np, np.asarray(word_j))
    assert np.array_equal(sa_np, np.asarray(sa_j))


def test_pallas_scan_interpret_parity(rng):
    """Pallas cut-scan kernel (interpret mode) vs the numpy oracle across
    window widths incl. the log-packed (w<=16) and per-offset (w>16)
    paths.  Real-chip lowering is validated separately (the documented
    Mosaic hazards are invisible to interpret mode)."""
    from pfbwtf_tpu.ops.hash import hash_scan_np
    from pfbwtf_tpu.ops.pallas.hash_scan import hash_scan_pallas

    n = (1 << 16) + 4096  # multiple of the 4096 block used below? padded
    codes = rng.integers(0, 4, size=1 << 16, dtype=np.uint8)
    chars = np.frombuffer(b"ACGT", np.uint8)[codes]
    for w, p in ((10, 100), (1, 3), (16, 511), (17, 97), (32, 97)):
        got = hash_scan_pallas(codes, w, p, blk=1 << 16, interpret=True)
        _, _, want = hash_scan_np(chars, w, p)
        assert np.array_equal(got, want), (w, p)


@pytest.mark.parametrize("alphabet", ["byte", "acgt3"])
def test_doubling_capture_equality_exact(alphabet):
    """doubling_with_captures: for adjacent kept suffixes of equal length,
    (C1, C2) equality must coincide EXACTLY with string equality — on an
    adversarial dict with planted duplicate words, deep shared prefixes,
    and words equal except at the last char (hash-free exactness gate).
    Covers both key-packing modes: raw bytes (k0=8) and 3-bit pure-ACGT
    (k0=16 with fingerprint tiers below)."""
    import numpy as np
    import jax.numpy as jnp

    from pfbwtf_tpu.constants import EndOfDict, EndOfWord
    from pfbwtf_tpu.ops.suffix import (
        dict_key_plan,
        doubling_with_captures,
        packed_dict_keys,
    )

    rng = np.random.default_rng(99)
    if alphabet == "acgt3":
        acgt = np.frombuffer(b"ACGT", np.uint8)
        base = acgt[rng.integers(0, 4, size=120)]
    else:
        base = rng.integers(65, 69, size=120, dtype=np.uint8)  # A..D
    words = [base.copy(), base.copy()]                      # exact dups
    w3 = base.copy()
    # differs at the last char, staying inside the declared alphabet
    # (an xor would mint a byte outside it and sidestep the
    # dict_alphabet gate the real drivers apply)
    w3[-1] = (
        (ord("A") if w3[-1] != ord("A") else ord("C"))
        if alphabet == "acgt3"
        else w3[-1] ^ 1
    )
    words.append(w3)
    w4 = base[:77].copy()                                   # prefix-length
    words.append(w4)
    for _ in range(6):
        size = int(rng.integers(5, 90))
        if alphabet == "acgt3":
            words.append(acgt[rng.integers(0, 4, size=size)])
        else:
            words.append(rng.integers(65, 69, size=size, dtype=np.uint8))
    flat = []
    for wd in words:
        flat.append(wd)
        flat.append(np.array([EndOfWord], np.uint8))
    flat.append(np.array([EndOfDict], np.uint8))
    dict_flat = np.concatenate(flat)
    D = dict_flat.shape[0]
    pad = np.zeros(37, np.uint8)  # bucket-style EndOfDict pad tail
    dict_flat = np.concatenate((dict_flat, pad))
    Dn = dict_flat.shape[0]

    # suffix lengths (distance to next separator)
    sep = np.flatnonzero(dict_flat <= 1)
    suf_len = np.zeros(Dn, np.int64)
    si = 0
    for p in range(Dn):
        while si < len(sep) and sep[si] < p:
            si += 1
        suf_len[p] = (sep[si] - p) if si < len(sep) else 0

    W = 3
    if alphabet == "acgt3":
        acgt2 = np.frombuffer(b"ACGT", np.uint8)
        # also plant equal suffixes SHORTER than k0=16 (fingerprint tier)
        assert (suf_len[np.flatnonzero(suf_len > W)] < 16).any()
    keys, k0, fp_word = packed_dict_keys(
        jnp.asarray(dict_flat), W, alphabet
    )
    _, t_min, _ = dict_key_plan(W, alphabet)
    sa, _, C1, C2 = doubling_with_captures(
        keys, None, jnp.asarray(suf_len), k0=k0, fp_word=fp_word,
        t_min=t_min,
    )
    sa = np.asarray(sa)
    C1 = np.asarray(C1)
    C2 = np.asarray(C2)
    kept = [int(p) for p in sa if suf_len[p] > W]
    for a, b in zip(kept, kept[1:]):
        la, lb = suf_len[a], suf_len[b]
        if la != lb:
            continue
        want = bytes(dict_flat[a:a + la]) == bytes(dict_flat[b:b + lb])
        got = (C1[a] == C1[b]) and (C2[a] == C2[b])
        assert got == want, (a, b, la, want, got)
