"""Suffix-array construction by prefix doubling.

The reference uses SACA-K / gSACA-K induced sorting (gsa/gsacak.c:2494-2526),
whose bucket scans are inherently sequential.  The TPU-native replacement is
prefix doubling (Manber–Myers): log(n) rounds of key sorting, each fully
parallel.  Sorting is `jax.lax.sort` on device (bitonic, massively parallel)
and `np.lexsort` in the host reference path.  Both produce identical SAs.

Two entry points:

* ``suffix_array_ints`` — the `sacak_int` role (pfparser.hpp:425): SA of an
  integer sequence terminated by a unique smallest 0.
* ``dict_suffix_sort`` — the `gsacak` role (pfbwt.hpp:206-223): generalized
  SA of the .dict byte array, where every EndOfWord separator is a distinct
  symbol ordered by word index (the standard $_1 < $_2 < ... convention).
  Equal suffix strings from different words therefore tie-break by word,
  and true string-equality groups are recovered separately with segmented
  polynomial hashes (`suffix_group_ids`).
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import EndOfWord, EndOfDict

_U64 = np.uint64


def sort_impl() -> str:
    """Device sort engine for the doubling/emission sorts: ``lax``
    (bitonic lax.sort) or ``radix`` (ops/radix.py LSD counting sort).
    Read at TRACE time — set PFBWT_SORT_IMPL before the first jitted call."""
    return os.environ.get("PFBWT_SORT_IMPL", "lax").lower()


def fanout_impl() -> str:
    """Emission fan-out engine: ``fill`` (piecewise-constant per-lane
    values by scattering per-emitter diffs at run heads + native-i32
    cumsums — no E_suffix indirection and no row gather from the nsuf
    table), ``scatter`` (suffix-id scatter + cummax then a 4-col row
    gather), or ``merge`` (one i32 kv-sort of concatenated marker/slot
    keys + cummax + compaction; measured loser at 64 MB on v5e).
    Read at TRACE time, like sort_impl.

    Default is ``fill`` since the 2026-08-20 64 MB on-chip race: e2e
    17.48 s (fill) vs 18.96 s (scatter) — and fill has no in-program
    row gather to blow up under buffer pressure (that gather measured
    8.6 s inside the scatter-engine program).  assemble_core falls back
    to scatter (with a warning) where fill is ineligible (emission key
    past 63 bits)."""
    return os.environ.get("PFBWT_FANOUT", "fill").lower()

# -- numpy reference path ----------------------------------------------------


def _doubling_np(rank: np.ndarray) -> np.ndarray:
    """Prefix doubling given initial integer keys; returns the suffix order."""
    n = rank.shape[0]
    rank = np.unique(rank, return_inverse=True)[1].astype(np.int64)
    k = 1
    idx = np.arange(n)
    while True:
        if rank[-1] == 0 and n == 1:
            return idx
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(changed)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank
        if new_rank[-1] == n - 1:
            return order
        k *= 2


def suffix_array_ints_np(seq: np.ndarray) -> np.ndarray:
    """SA of an integer sequence whose last element is the unique minimum."""
    return _doubling_np(np.asarray(seq, dtype=np.int64))


def dict_initial_symbols_np(dict_flat: np.ndarray):
    """Initial doubling keys for the .dict byte array.

    EndOfDict -> 0; the i-th EndOfWord -> 1+i (separators ordered by word);
    real char c -> dwords+1+c.  Also returns per-position word ids and
    suffix lengths (distance to the owning separator).
    """
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    D = dict_flat.shape[0]
    idt = np.int32 if D < 2**31 - 2 else np.int64
    is_eow = dict_flat == EndOfWord
    dwords = int(is_eow.sum())
    word_id = np.concatenate(
        (np.zeros(1, idt), np.cumsum(is_eow, dtype=idt)[:-1])
    )
    sym = dict_flat.astype(idt) + idt(dwords + 1)
    sym[is_eow] = idt(1) + word_id[is_eow]
    sym[dict_flat == EndOfDict] = 0
    sep_pos = np.flatnonzero(is_eow | (dict_flat == EndOfDict)).astype(idt)
    pos = np.arange(D, dtype=idt)
    next_sep = sep_pos[np.searchsorted(sep_pos, pos)]
    suf_len = next_sep - pos
    return sym, word_id, suf_len, dwords


def dict_suffix_sort_np(dict_flat: np.ndarray):
    """Generalized suffix order of the dict.

    Returns (sa, word_id, suf_len, dwords): sa over ALL positions.
    """
    sym, word_id, suf_len, dwords = dict_initial_symbols_np(dict_flat)
    sa = _doubling_np(sym)
    return sa, word_id, suf_len, dwords


_HB1 = _U64(0x9E3779B97F4A7C15)  # odd -> invertible mod 2**64
_HB2 = _U64(0xC2B2AE3D27D4EB4F)


def _segmented_suffix_hashes_np(dict_flat: np.ndarray, suf_len: np.ndarray, base):
    """H[i] = polynomial hash of dict_flat[i : i+suf_len[i]] mod 2**64.

    Uses H[i] = (G[i] - G[i+len]) * base^{-i} with G[i] = sum_{j>=i} c_j B^j,
    which vectorizes as two cumulative passes.
    """
    c = dict_flat.astype(_U64)
    D = c.shape[0]
    # powers[i] = base**i mod 2**64, via cumulative product
    b = np.full(D, base, dtype=_U64)
    b[0] = _U64(1)
    powers = np.multiply.accumulate(b)
    terms = c * powers
    G = np.zeros(D + 1, dtype=_U64)
    G[:D] = terms[::-1].cumsum(dtype=_U64)[::-1]
    inv = _U64(pow(int(base), -1, 1 << 64))
    binv = np.full(D, inv, dtype=_U64)
    binv[0] = _U64(1)
    inv_powers = np.multiply.accumulate(binv)
    idx = np.arange(D)
    return (G[idx] - G[idx + suf_len]) * inv_powers


def cumsum_u64_jax(x, reverse: bool = False, blk: int = 1 << 15):
    """Inclusive cumsum of a uint64 vector mod 2**64 with NO 64-bit scan.

    TPU lowers 64-bit scans to variadic u32-pair reduce-windows whose
    scoped-VMEM tiles exceed the 16 MB hardware limit at multi-M sizes
    (observed on-chip for both forward and reverse forms).  Decomposition:
    split into four 16-bit limbs and scan each in NATIVE int32 within
    2**15-element blocks (block-limb sums stay < 2**31), reconstruct
    u64 partials elementwise, then add the per-block exclusive prefix —
    a u64 scan over only n/2**15 block totals.
    """
    n = x.shape[0]
    if n == 0:
        return x
    nblk = -(-n // blk)
    pad = nblk * blk - n
    xp = jnp.concatenate((x, jnp.zeros(pad, jnp.uint64))) if pad else x
    if reverse:
        xp = xp[::-1]
    g = xp.reshape(nblk, blk)
    within = jnp.zeros((nblk, blk), jnp.uint64)
    for limb in range(4):
        part = ((g >> jnp.uint64(16 * limb)) & jnp.uint64(0xFFFF)).astype(
            jnp.int32
        )
        c = jnp.cumsum(part, axis=1)  # native i32 scan; max < 2**31
        within = within + (c.astype(jnp.uint64) << jnp.uint64(16 * limb))
    totals = within[:, -1]
    prefix = jnp.concatenate(
        (jnp.zeros(1, jnp.uint64), jnp.cumsum(totals)[:-1])
    )  # u64 scan over nblk elements only (n / 2**15 — trivially small)
    out = (within + prefix[:, None]).reshape(-1)
    if reverse:
        out = out[::-1]
    return out[:n] if pad else out


def pow_u64_jax(base: int, nexp: int):
    """[base**0, ..., base**(nexp-1)] mod 2**64 via vectorized binary
    exponentiation: log2(nexp) ELEMENTWISE u64 multiplies instead of a
    uint64 cumprod — 64-bit scans lower to u32-pair reduce-windows on TPU
    and blow the scoped-VMEM budget at multi-M sizes (observed on-chip)."""
    e = jnp.arange(nexp, dtype=jnp.uint32)
    acc = jnp.ones(nexp, dtype=jnp.uint64)
    b = int(base) & 0xFFFFFFFFFFFFFFFF
    for bit in range(max(int(nexp - 1).bit_length(), 1)):
        mask = ((e >> np.uint32(bit)) & np.uint32(1)) != 0
        acc = jnp.where(mask, acc * np.uint64(b), acc)
        b = (b * b) & 0xFFFFFFFFFFFFFFFF
    return acc


def segmented_suffix_hashes_jax(dict_flat, suf_len, base: int):
    """Device version of _segmented_suffix_hashes_np (uint64 wraps mod
    2**64 in XLA exactly as in numpy), so the dict->assembly chain needs
    no host hash round-trip.  Powers come from binary exponentiation; the
    single remaining 64-bit scan per base is the reverse cumsum of terms
    (jax.lax.cumsum(reverse=True) — no flip gathers)."""
    c = dict_flat.astype(jnp.uint64)
    D = c.shape[0]
    powers = pow_u64_jax(base, D)
    terms = c * powers
    G = jnp.concatenate(
        (
            cumsum_u64_jax(terms, reverse=True),
            jnp.zeros(1, jnp.uint64),
        )
    )
    inv = pow(int(base), -1, 1 << 64)
    inv_powers = pow_u64_jax(inv, D)
    idx = jnp.arange(D)
    return (G[idx] - G[idx + suf_len]) * inv_powers


def suffix_group_ids_np(dict_flat, sa_kept, suf_len, verify: bool = True):
    """Group ids (0-based, ascending in sorted order) for equal suffix strings.

    ``sa_kept``: suffix start positions in lexicographic order (already
    filtered to len > w).  Adjacent suffixes are merged into one group iff
    their lengths and two independent 64-bit polynomial hashes agree; with
    ``verify`` the byte equality of each multi-member group is checked
    exactly, making the result fully deterministic rather than
    hash-probabilistic.
    """
    h1 = _segmented_suffix_hashes_np(dict_flat, suf_len, _HB1)
    h2 = _segmented_suffix_hashes_np(dict_flat, suf_len, _HB2)
    ls = suf_len[sa_kept]
    e = (
        (ls[1:] == ls[:-1])
        & (h1[sa_kept][1:] == h1[sa_kept][:-1])
        & (h2[sa_kept][1:] == h2[sa_kept][:-1])
    )
    gid = np.concatenate(([0], np.cumsum(~e))).astype(np.int64)
    if verify and e.any():
        # vectorized byte verification of every claimed-equal adjacent pair:
        # one masked compare per offset d (bounded by the longest pair)
        flat = np.asarray(dict_flat)
        pairs = np.flatnonzero(e)
        a = sa_kept[pairs]
        b = sa_kept[pairs + 1]
        L = ls[pairs].astype(np.int64)
        ok = np.ones(pairs.shape[0], dtype=bool)
        top = flat.shape[0] - 1
        for d in range(int(L.max())):
            m = d < L  # masked lanes may index past their suffix: clip
            ai = np.minimum(a + d, top)
            bi = np.minimum(b + d, top)
            ok &= ~m | (flat[ai] == flat[bi])
        if not ok.all():
            raise AssertionError("suffix hash collision — please report")
    return gid


# -- JAX path ----------------------------------------------------------------


@partial(jax.jit, static_argnames=("impl",))
def _doubling_jax(keys, impl: str = "lax"):
    """Prefix doubling on device with early exit via lax.while_loop.

    All shapes are static (the carry is the dense rank array); the loop ends
    as soon as ranks are all distinct, after at most ceil(log2 n) rounds.

    ``impl='lax'``: each round fuses the (rank, rank[i+k]) pair into ONE
    int64 sort key — rank*(n+1) + key2+1, collision-free since both < n+1 —
    so lax.sort compares a single operand per element instead of the
    reference's sequential bucket scans or a two-operand lexicographic sort.

    ``impl='radix'``: each round is a stable LSD counting sort over the
    (rank, key2+1) pair as two int32 keys (ops/radix.py) — no 64-bit pack
    at all, since TPU u64 arithmetic is emulated.  Requires n < 2**31
    (callers' width guards fire long before).
    """
    n = keys.shape[0]
    # it: the RANK integer type.  Ranks/indices are < n, so int32 when it
    # fits — TPU scans of 64-bit values lower to u32-pair reduce-windows
    # (emulated carries) that both run slow and exceed scoped VMEM at
    # multi-M sizes; int32 cumsums are native
    narrow = n < 2**31 - 2
    it = jnp.int32 if narrow else jnp.int64
    idx = jnp.arange(n, dtype=it)
    use_radix = impl == "radix" and narrow
    # round anatomy measured on v5e at 5.2M lanes: kv-sort formulation
    # (sort carries iota; inverse permutation via a second value-carrying
    # sort; key2 as a rolled copy; key pack by shift) runs one round in
    # 52 ms vs 237 ms for argsort + i64 gather + rank scatter
    B = int(np.ceil(np.log2(n + 2)))

    def invert(order, new_rank):
        if not use_radix:
            _, rank = jax.lax.sort((order, new_rank), num_keys=1)
            return rank
        return (
            jnp.zeros(n, it)
            .at[order]
            .set(new_rank, unique_indices=True, mode="promise_in_bounds")
        )

    def rank_of(ck):
        cks, order = jax.lax.sort((ck, idx), num_keys=1)
        changed = jnp.concatenate(
            (jnp.zeros(1, it), (cks[1:] != cks[:-1]).astype(it))
        )
        return invert(order, jnp.cumsum(changed))

    def densify2(order, r, k2):
        r_s, k_s = r[order], k2[order]
        changed = jnp.concatenate(
            (
                jnp.zeros(1, it),
                ((r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])).astype(it),
            )
        )
        new_rank = jnp.cumsum(changed)
        return (
            jnp.zeros(n, it)
            .at[order]
            .set(new_rank, unique_indices=True, mode="promise_in_bounds")
        )

    rank = rank_of(keys.astype(jnp.int64))

    def cond(carry):
        rank, k = carry
        return (jnp.max(rank) < n - 1) & (k < n)

    if use_radix:
        from .radix import key_bits, radix_argsort_pair

        nb = key_bits(n)

        def body(carry):
            rank, k = carry
            key2 = jnp.where(
                idx.astype(jnp.int64) + k < n, jnp.roll(rank, -k), it(-1)
            )
            order = radix_argsort_pair(
                rank, key2 + it(1), nbits_hi=nb, nbits_lo=nb
            )
            rank = densify2(order, rank, key2)
            return rank, k * 2

    else:

        def body(carry):
            rank, k = carry
            key2 = jnp.where(
                idx.astype(jnp.int64) + k < n, jnp.roll(rank, -k), it(-1)
            )
            if narrow:
                ckey = (rank.astype(jnp.int64) << B) | (
                    key2.astype(jnp.int64) + 1
                )
            else:
                ckey = rank.astype(jnp.int64) * jnp.int64(n + 1) + (
                    key2.astype(jnp.int64) + 1
                )
            rank = rank_of(ckey)
            return rank, k * 2

    # k stays int64: it doubles past n before the distinct-ranks exit on
    # adversarial inputs, and int32 would wrap (scalar — no scan cost)
    rank, _ = jax.lax.while_loop(cond, body, (rank, jnp.int64(1)))
    if use_radix:
        from .radix import radix_argsort_u32

        final = radix_argsort_u32(rank, nbits=nb)
    else:
        final = jnp.argsort(rank)
    return final.astype(jnp.int64), rank.astype(jnp.int64)


def compact_indices_jax(mask, size: int, fill: int = 0):
    """Ascending indices of True lanes — the jnp.nonzero(size=, fill_value=)
    equivalent — via ONE single-operand sort.  Sized nonzero lowers to a
    full-length scatter on TPU (measured 1.9 s for an 18.9M mask on v5e,
    ~100 ns/update); the i32 bitonic sort does the same job in ~50 ms."""
    n = mask.shape[0]
    it = jnp.int32 if n < 2**31 - 2 else jnp.int64
    idx = jnp.arange(n, dtype=it)
    key = jnp.where(mask, idx, it(n))  # False lanes sort last
    out = jax.lax.sort(key)
    if size > n:  # requested capacity exceeds the mask length: pad fills
        out = jnp.concatenate((out, jnp.full(size - n, n, it)))
    out = out[:size]
    return jnp.where(out == it(n), it(fill), out)


def packed_dict_keys_k0(w: int) -> int:
    """The initial doubling level the BYTE-packed keys use: largest power
    of two <= min(8, w+1) bytes per key."""
    k0 = 1
    while k0 * 2 <= min(8, w + 1):
        k0 *= 2
    return k0


# 3-bit symbol packing: 16 symbols per i64 key (exactly k0 — the rank
# key IS the level-16 prefix; its top 24 bits serve as the t<=8
# fingerprint source).  Order-preserving over the pure-ACGT dict
# alphabet {EOD 0, EOW 1, Dollar 2, A, C, G, T}.
_FP_SYMS = 16


def dict_key_plan(w: int, alphabet: str = "byte"):
    """(k0, t_min, n_fp) for the dict doubling keys.

    byte:  k0 = largest pow2 <= min(8, w+1) raw bytes in one i64; every
           capture level t >= k0 (kept suffixes are > w long), so no
           fingerprint tiers (t_min = k0, n_fp = 0).
    acgt3: pure-ACGT alphabet packs 3 bits/symbol — the initial rank
           covers k0 = 16 symbols (one fewer doubling round than byte
           packing's 8), and capture levels BELOW k0 are served by exact
           prefix FINGERPRINTS sliced from the packed word (t <= 8 means
           3t <= 24 bits: the block CONTENT itself fits the i32 capture
           table — equality of values IS equality of blocks).  t_min =
           floor_pow2(w+1) (kept suffixes are longer than w), n_fp
           fingerprint rows fill levels [t_min, k0)."""
    if alphabet == "acgt3":
        k0 = 16
        tm = 1
        while tm * 2 <= min(w + 1, k0):
            tm *= 2
        n_fp = int(np.round(np.log2(k0) - np.log2(tm)))
        return k0, tm, n_fp
    k0 = packed_dict_keys_k0(w)
    return k0, k0, 0


def _acgt3_codes(dict_flat):
    """Order-preserving 3-bit codes for the pure-ACGT dict alphabet:
    0,1,2 fixed; A(65)->3 C(67)->4 G(71)->5 T(84)->6 — native-i32
    compares, not a 256-LUT gather (the LUT form measured 0.59 s over
    75M lanes)."""
    c = dict_flat.astype(jnp.int32)
    code = jnp.where(
        c <= 2,
        c,
        3
        + (c == 67).astype(jnp.int32)
        + (c == 71).astype(jnp.int32) * 2
        + (c == 84).astype(jnp.int32) * 3,
    )
    return code


def packed_dict_keys(dict_flat, w: int, alphabet: str = "byte"):
    """Initial doubling keys for the dict byte array, with every
    EndOfDict position (terminator + bucket pads) overridden by a
    distinct ascending negative (so the loop is bounded by real max LCP,
    not the pad-run length).  Raw-byte order (EOD 0 < EOW 1 < Dollar 2 <
    chars) equals the generalized-symbol order for DISTINCT suffix
    strings; equal strings tie on (chars, EOW) and order within an
    equality group is immaterial downstream (groups merge; the emission
    sorts by ilist position within a group).

    byte mode packs k0 raw bytes big-endian into one i64 (k0 <= w+1 so
    captures stay within strings).  acgt3 mode packs _FP_SYMS 3-bit
    symbols; the rank key is masked to exactly k0 = 16 symbols (capture
    exactness needs ranks at exact pow2 levels) while the full packed
    word doubles as the fingerprint source for capture levels below k0
    (see dict_key_plan).  Returns (rank_keys_i64, k0, fp_word_or_None).
    """
    from ..constants import EndOfDict as _EOD

    D = dict_flat.shape[0]
    iota = jnp.arange(D, dtype=jnp.int64)
    if alphabet == "acgt3":
        k0, _, _ = dict_key_plan(w, alphabet)
        codes = _acgt3_codes(dict_flat)
        # two native-i32 half-words (8 symbols = 24 bits each), ONE i64
        # combine: 64-bit elementwise ops are emulated u32 pairs on TPU,
        # so the 16-symbol pack costs ~the same as the byte mode's
        # 8-iteration i64 pack while starting the doubling a level higher
        halves = []
        for h in range(2):
            acc = jnp.zeros(D, jnp.int32)
            for j in range(8 * h, 8 * h + 8):
                b = codes if j == 0 else jnp.concatenate(
                    (codes[j:], jnp.zeros(j, jnp.int32))
                )
                acc = (acc << jnp.int32(3)) | b
            halves.append(acc)
        key = (
            halves[0].astype(jnp.int64) << jnp.int64(24)
        ) | halves[1].astype(jnp.int64)
        eod = dict_flat == _EOD
        fp_word = jnp.where(eod, iota - D, key)
        return fp_word, k0, fp_word
    k0 = packed_dict_keys_k0(w)
    key = jnp.zeros(D, jnp.int64)
    for j in range(k0):
        b = dict_flat if j == 0 else jnp.concatenate(
            (dict_flat[j:], jnp.zeros(j, jnp.uint8))
        )
        key = (key << jnp.int64(8)) | b.astype(jnp.int64)
    key = jnp.where(dict_flat == _EOD, iota - D, key)
    return key, k0, None


def _floor_pow2_i32(x):
    """Largest power of two <= x, elementwise (x >= 1), via bit smearing."""
    v = x.astype(jnp.int32)
    v = v | (v >> 1)
    v = v | (v >> 2)
    v = v | (v >> 4)
    v = v | (v >> 8)
    v = v | (v >> 16)
    return v - (v >> 1)


def doubling_with_captures(
    keys, cap_pos, cap_len, k0: int, k_stop=None, impl: str = "lax",
    n_levels: int = None, fp_word=None, t_min: int = None,
):
    """Prefix doubling that additionally captures, per query j, the rank
    blocks needed for O(1) EXACT substring equality (the sparse-table
    two-block trick):

        t_j  = max(k0, floor_pow2(cap_len[j]))      (so t <= cap_len)
        C1_j = R_{t_j}[cap_pos[j]]
        C2_j = R_{t_j}[cap_pos[j] + cap_len[j] - t_j]

    Two queries with equal cap_len are substring-equal over their whole
    length IFF (C1, C2) match — the two level-t blocks cover [0, len)
    because 2*t >= len.  This replaces the emulated-u64 polynomial-hash
    equality (pow_u64/cumsum_u64 chains) with a handful of int32 gathers,
    and is exact rather than hash-probabilistic.

    ``keys`` are level-k0 initial keys (k0=1 for raw symbols; callers may
    pack k0 bytes into one key to skip early rounds — every cap_len must
    then be >= k0).  ``cap_pos=None`` captures at every key position
    (identity), making C1 gather-free.  ``k_stop`` (dynamic scalar)
    truncates the loop once
    the gap reaches it (prefixes of that length decided); None runs to
    full distinctness.  The early all-distinct exit cannot fire before
    any query's capture level: while two equal substrings of length L
    exist, ranks collide at every level <= floor_pow2(L).  Uncaptured
    queries (possible only when no equal pair of that length exists)
    keep distinct sentinel captures, so their equality tests are false.

    Returns (order, rank, C1, C2).
    """
    n = keys.shape[0]
    m = n if cap_pos is None else cap_pos.shape[0]
    narrow = n < 2**31 - 2
    it = jnp.int32 if narrow else jnp.int64
    idx = jnp.arange(n, dtype=it)
    use_radix = impl == "radix" and narrow
    if use_radix:
        from .radix import key_bits, radix_argsort_pair

        nb = key_bits(n)
    if k_stop is None:
        k_stop = jnp.int64(n)
    # key pack by SHIFT (i64 emulated multiplies are pricier); sorts carry
    # values (lax.sort num_keys=1) so densify needs no gather, and the
    # position-space rank comes back via a second value-carrying sort of
    # the order permutation (PFBWT_DBL_INV=scatter keeps the scatter form)
    B = int(np.ceil(np.log2(n + 2)))
    inv_sort = os.environ.get("PFBWT_DBL_INV", "sort").lower() != "scatter"

    def invert(order, new_rank):
        if inv_sort and not use_radix:
            _, rank = jax.lax.sort((order, new_rank), num_keys=1)
            return rank
        return (
            jnp.zeros(n, it)
            .at[order]
            .set(new_rank, unique_indices=True, mode="promise_in_bounds")
        )

    def rank_of(ck):
        cks, order = jax.lax.sort((ck, idx), num_keys=1)
        changed = jnp.concatenate(
            (jnp.zeros(1, it), (cks[1:] != cks[:-1]).astype(it))
        )
        return invert(order, jnp.cumsum(changed))

    identity = cap_pos is None  # captures at every position of `keys`
    if identity:
        cap_pos = idx
    else:
        cap_pos = jnp.clip(cap_pos.astype(it), 0, n - 1)
    cap_len = cap_len.astype(it)
    # fingerprint tiers serve capture levels in [t_min, k0); without a
    # fingerprint word every level must be >= k0 (the byte-packed mode)
    if fp_word is None or t_min is None:
        t_min = k0
    t = jnp.maximum(
        it(t_min), _floor_pow2_i32(jnp.maximum(cap_len, 1)).astype(it)
    )
    p2 = jnp.clip(cap_pos + cap_len - t, 0, n - 1)

    k0i = jnp.int64(k0)
    # distinct sentinels (negative, unique per query) so an uncaptured
    # query never tests equal
    C1 = -jnp.arange(m, dtype=it) - it(1)
    C2 = C1
    if identity:
        # STACKED-LEVEL captures: the in-loop form gathers rank[p2]
        # (m random lanes) and selects C1/C2 EVERY round — measured as
        # the bulk of the 0.47 s/round loop-body fusion at 64 MB on v5e
        # (profiler: while.23 5.9 s of a 12.5 s J3).  Instead, carry a
        # (levels, n) rank table written with ONE row update per round
        # (aliased in-place by XLA) and capture with ONE batched gather
        # after the loop.  Rows beyond the executed rounds stay unwritten;
        # such queries keep their distinct negative sentinels — exactness
        # argument unchanged (no equal pair of that length can exist once
        # ranks are fully distinct).
        log2k0 = int(np.round(np.log2(k0)))
        log2tmin = int(np.round(np.log2(t_min)))
        # fingerprint rows fill levels [t_min, k0): row r holds the exact
        # 3-bit-packed CONTENT of the (t_min << r)-symbol prefix at each
        # position (<= 24 bits, fits the i32 table) — equality of values
        # is equality of blocks, written once before the loop
        n_fp = log2k0 - log2tmin
        # ``n_levels`` (static) bounds the table height: callers that know
        # the true max capture length (e.g. the fused driver fetches max
        # dict word length with its sizing scalars) pass the exact need —
        # the worst-case bound is ceil(log2 n) rows, a 1.9 GB table at
        # dict_b=21M that pushes the whole J3 program into XLA
        # rematerialization.  Queries whose level exceeds the table keep
        # their sentinels (tested below via lvl_q < n_levels), so a too-
        # small bound degrades to "no equal pair detected at that length"
        # — which is only correct when the bound really covers every
        # capture level; the fused driver guarantees it from max(dict_len).
        full_levels = max(
            int(np.ceil(np.log2(n + 2))) - log2k0 + 1 + n_fp, 1
        )
        if n_levels is None:
            n_levels = full_levels
        n_levels = max(n_fp + 1, min(n_levels, full_levels))
        # +1 trash row: rounds past the cap dump there (dynamic_update_
        # slice CLAMPS starts, which would otherwise overwrite the last
        # real row); capped-out queries keep sentinels via lvl_q <
        # n_levels below
        Rlev0 = jnp.zeros((n_levels + 1, n), it)
        for r in range(n_fp):
            t_r = t_min << r
            frow = (
                fp_word >> jnp.int64(3 * (_FP_SYMS - t_r))
            ).astype(it)
            Rlev0 = jax.lax.dynamic_update_slice(
                Rlev0, frow[None], (r, 0)
            )

        # POSITIONAL ranks: rank = sorted position of the group's head
        # (not a dense cumsum).  Equality semantics are identical (equal
        # iff same group) and the value is directly refinable WITHIN a
        # group: after splitting a block that starts at global sorted
        # position p, the sub-group starting o lanes into the block has
        # positional rank exactly p + o — no global renumbering needed,
        # which is what makes the subset-refinement phase below possible.
        # Distinctness is tracked by a carried GROUP COUNT (a middle
        # block of size 2 does not lower max(rank), so the old
        # max-rank test is invalid for positional ranks).
        def posrank_of(ck):
            cks, order = jax.lax.sort((ck, idx), num_keys=1)
            changed = jnp.concatenate(
                (jnp.ones(1, bool), cks[1:] != cks[:-1])
            )
            headpos = jax.lax.cummax(jnp.where(changed, idx, it(0)))
            n_groups = jnp.sum(changed.astype(it))
            single = changed & jnp.concatenate(
                (changed[1:], jnp.ones(1, bool))
            )
            n_unres = it(n) - jnp.sum(single.astype(it))
            return invert(order, headpos), n_groups, n_unres

        def posrank_radix(rankv, key2):
            order = radix_argsort_pair(
                rankv, key2 + it(1), nbits_hi=nb, nbits_lo=nb
            )
            r_s, k_s = rankv[order], key2[order]
            changed = jnp.concatenate(
                (
                    jnp.ones(1, bool),
                    (r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1]),
                )
            )
            headpos = jax.lax.cummax(jnp.where(changed, idx, it(0)))
            n_groups = jnp.sum(changed.astype(it))
            single = changed & jnp.concatenate(
                (changed[1:], jnp.ones(1, bool))
            )
            n_unres = it(n) - jnp.sum(single.astype(it))
            return invert(order, headpos), n_groups, n_unres

        def round_rank(rank, k):
            key2 = jnp.where(
                idx.astype(jnp.int64) + k < n, jnp.roll(rank, -k), it(-1)
            )
            if use_radix:
                return posrank_radix(rank, key2)
            if narrow:
                ck = (rank.astype(jnp.int64) << B) | (
                    key2.astype(jnp.int64) + 1
                )
            else:
                ck = rank.astype(jnp.int64) * jnp.int64(n + 1) + (
                    key2.astype(jnp.int64) + 1
                )
            return posrank_of(ck)

        def write_row(Rlev, rank, k):
            lvl = (
                jax.lax.population_count(k.astype(jnp.int64) - 1)
                .astype(jnp.int32)
                - log2k0
                + n_fp
            )
            return jax.lax.dynamic_update_slice(
                Rlev,
                rank[None].astype(it),
                (jnp.minimum(lvl, n_levels), jnp.int32(0)),
            )

        rank, n_groups, n_unres = posrank_of(keys.astype(jnp.int64))
        Rlev0 = jax.lax.dynamic_update_slice(
            Rlev0, rank[None].astype(it), (n_fp, 0)
        )

        # SUBSET-REFINEMENT schedule: full-width rounds only until the
        # unresolved lane count (members of groups of size > 1) fits the
        # static bucket m_sub, then rounds sort/gather ONLY those lanes.
        # Resolved ranks never change, and a split sub-group's positional
        # rank is computable block-locally (see above), so refinement is
        # exact.  MEASURED on v5e at 64 MB (2026-08-21, same-process A/B,
        # dict_b=21M): subset-off 10.08 s e2e, div=4 10.88 s, div=8
        # 10.19 s — a wash to a loss, because bitonic sort cost shrinks
        # only ~linearly in lanes (log^2 passes stay), the subset gathers
        # are random (latency-bound), and the capture-table row write
        # stays full-width; OFF by default, PFBWT_DBL_SUBSET=N opts in.
        sub_div = int(os.environ.get("PFBWT_DBL_SUBSET", "0"))
        use_subset = narrow and sub_div > 0
        m_sub = max(n // max(sub_div, 1), 1 << 12) if use_subset else n

        def cond_a(carry):
            rank, k, Rlev, n_groups, n_unres = carry
            full = (n_groups < it(n)) & (k < k_stop)
            if use_subset:
                return full & (n_unres > it(m_sub))
            return full

        def body_a(carry):
            rank, k, Rlev, n_groups, n_unres = carry
            rank, n_groups, n_unres = round_rank(rank, k)
            k = k * 2
            Rlev = write_row(Rlev, rank, k)
            return rank, k, Rlev, n_groups, n_unres

        rank, k_cur, Rlev, n_groups, n_unres = jax.lax.while_loop(
            cond_a, body_a, (rank, k0i, Rlev0, n_groups, n_unres)
        )

        if use_subset:
            # unresolved mask in position space: group size > 1
            hist = jnp.zeros(n, it).at[jnp.clip(rank, 0, n - 1)].add(
                jnp.ones((), it), mode="promise_in_bounds"
            )
            unres = hist[jnp.clip(rank, 0, n - 1)] > it(1)
            pos_u = compact_indices_jax(unres, m_sub, fill=n).astype(it)
            sidx = jnp.arange(m_sub, dtype=it)
            huge = jnp.iinfo(jnp.int64).max // 2

            def cond_b(carry):
                rank, k, Rlev, n_groups = carry
                return (n_groups < it(n)) & (k < k_stop)

            def body_b(carry):
                rank, k, Rlev, n_groups = carry
                valid = pos_u < it(n)
                pu = jnp.clip(pos_u, 0, n - 1)
                ru = rank[pu]
                k2p = pu.astype(jnp.int64) + k
                key2 = jnp.where(
                    (k2p < n) & valid,
                    rank[jnp.clip(k2p, 0, n - 1).astype(it)],
                    it(-1),
                )
                ck = (ru.astype(jnp.int64) << B) | (
                    key2.astype(jnp.int64) + 1
                )
                ck = jnp.where(
                    valid, ck, huge + sidx.astype(jnp.int64)
                )
                # carry the UNCLIPPED positions: fill lanes must sort out
                # with pos == n so valid_s masks them (a clipped carry
                # would alias them onto position n-1 and corrupt it)
                cks, pos_s = jax.lax.sort((ck, pos_u), num_keys=1)
                ru_s = (cks >> B).astype(it)
                changed = jnp.concatenate(
                    (jnp.ones(1, bool), cks[1:] != cks[:-1])
                )
                bh = jnp.concatenate(
                    (jnp.ones(1, bool), ru_s[1:] != ru_s[:-1])
                )
                base = jax.lax.cummax(jnp.where(bh, sidx, it(0)))
                head = jax.lax.cummax(jnp.where(changed, sidx, it(0)))
                new_rank = ru_s + (head - base)
                valid_s = pos_s < it(n)
                splits = jnp.sum((changed & valid_s).astype(it)) - \
                    jnp.sum((bh & valid_s).astype(it))
                rank = rank.at[
                    jnp.where(valid_s, pos_s, it(n))
                ].set(new_rank, mode="drop", unique_indices=True)
                k = k * 2
                Rlev = write_row(Rlev, rank, k)
                return rank, k, Rlev, n_groups + splits

            rank, k_final, Rlev, n_groups = jax.lax.while_loop(
                cond_b, body_b, (rank, k_cur, Rlev, n_groups)
            )
        else:
            k_final = k_cur
        # unified row index: fingerprint rows [0, n_fp) then rank rows;
        # t >= t_min always, so lvl_q = log2(t) - log2(t_min) >= 0
        lvl_q = (
            jax.lax.population_count(t.astype(jnp.int64) - 1)
            .astype(it)
            - it(log2tmin)
        )
        lvl_written = (
            jax.lax.population_count(k_final - 1).astype(it)
            - it(log2k0) + it(n_fp)
        )
        ok = (lvl_q <= lvl_written) & (lvl_q < it(n_levels))
        lvl_c = jnp.clip(lvl_q, 0, n_levels - 1)
        # C1's position index is the identity (cap_pos == idx in the
        # identity-capture case), so the (level, pos) gather collapses to
        # a select over the <= n_levels table rows: sequential passes
        # instead of a 0.47 s random gather over the stacked table.
        c1_sel = Rlev[0]
        for L in range(1, n_levels):
            c1_sel = jnp.where(lvl_c == it(L), Rlev[L], c1_sel)
        C1 = jnp.where(ok, c1_sel, C1)
        C2 = jnp.where(ok, Rlev[lvl_c, p2], C2)
        if use_radix:
            from .radix import radix_argsort_u32

            final = radix_argsort_u32(rank, nbits=key_bits(n))
        else:
            final = jnp.argsort(rank)
        return final.astype(jnp.int64), rank, C1, C2

    rank = rank_of(keys.astype(jnp.int64))
    hit0 = t == it(k0)
    C1 = jnp.where(hit0, rank[cap_pos], C1)
    C2 = jnp.where(hit0, rank[p2], C2)

    def cond(carry):
        rank, k, C1, C2 = carry
        return (jnp.max(rank) < n - 1) & (k < k_stop)

    def body(carry):
        rank, k, C1, C2 = carry
        # rank[i+k] as a shifted copy: static-shape slices via roll, tail
        # masked (wrapped lanes are exactly the masked ones)
        key2 = jnp.where(
            idx.astype(jnp.int64) + k < n, jnp.roll(rank, -k), it(-1)
        )
        if use_radix:
            order = radix_argsort_pair(
                rank, key2 + it(1), nbits_hi=nb, nbits_lo=nb
            )
            r_s, k_s = rank[order], key2[order]
            changed = jnp.concatenate(
                (
                    jnp.zeros(1, it),
                    ((r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])).astype(
                        it
                    ),
                )
            )
            rank = invert(order, jnp.cumsum(changed))
        elif narrow:
            ck = (rank.astype(jnp.int64) << B) | (
                key2.astype(jnp.int64) + 1
            )
            rank = rank_of(ck)
        else:
            ck = rank.astype(jnp.int64) * jnp.int64(n + 1) + (
                key2.astype(jnp.int64) + 1
            )
            rank = rank_of(ck)
        k = k * 2
        hit = t.astype(jnp.int64) == k
        C1 = jnp.where(hit, rank if identity else rank[cap_pos], C1)
        C2 = jnp.where(hit, rank[p2], C2)
        return rank, k, C1, C2

    rank, _, C1, C2 = jax.lax.while_loop(
        cond, body, (rank, k0i, C1, C2)
    )
    if use_radix:
        from .radix import radix_argsort_u32

        final = radix_argsort_u32(rank, nbits=key_bits(n))
    else:
        final = jnp.argsort(rank)
    return final.astype(jnp.int64), rank, C1, C2


def suffix_array_ints_jax(seq) -> jnp.ndarray:
    """SA of an integer sequence whose last element is the unique minimum."""
    seq = jnp.asarray(seq, dtype=jnp.int64)
    order, _ = _doubling_jax(seq, impl=sort_impl())
    return order


def dict_suffix_sort_jax(dict_flat):
    """Generalized dict suffix order on device (gsacak role).  Counting
    scans run in int32 (native TPU scans) — D < 2**31 is enforced by the
    32-bit width guards long before."""
    dict_flat = jnp.asarray(dict_flat, dtype=jnp.uint8)
    D = dict_flat.shape[0]
    it = jnp.int32 if D < 2**31 - 2 else jnp.int64
    is_eow = dict_flat == EndOfWord
    word_id = jnp.concatenate(
        (jnp.zeros(1, it), jnp.cumsum(is_eow.astype(it))[:-1])
    )
    dwords = jnp.sum(is_eow.astype(it))  # reduction, not a scan — cheap
    iota = jnp.arange(D, dtype=it)
    sym = dict_flat.astype(it) + (dwords + it(1))
    sym = jnp.where(is_eow, it(1) + word_id, sym)
    # EndOfDict (the terminator AND every bucket-pad position): DISTINCT
    # ascending negatives.  With one shared 0 symbol the doubling loop
    # only terminates once k exceeds the pad-run length (~log2(n) rounds
    # regardless of content); distinct pad symbols bound the loop by the
    # real suffixes' max LCP (~log2(maxlen)).  Relative pad order is
    # irrelevant: separator suffixes are dropped before emission, and
    # real suffixes are distinguished at or before their word's unique
    # separator, never by post-terminator content.
    sym = jnp.where(dict_flat == EndOfDict, iota - it(D), sym)
    sa, rank = _doubling_jax(sym, impl=sort_impl())
    return sa, rank, word_id.astype(jnp.int64), dwords.astype(jnp.int64)
