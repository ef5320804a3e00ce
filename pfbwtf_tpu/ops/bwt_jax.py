"""Device-side final BWT assembly.

Same emission-sort formulation as ops/bwt.py (see its docstring for the
derivation), with every large-array stage on device:

* generalized dict suffix order   -> prefix doubling (lax.sort rounds)
* suffix length per position      -> reverse cummin of separator indices
* kept-suffix compaction          -> jnp.nonzero with static size
* emission fan-out                -> jnp.repeat(total_repeat_length=...)
* final (group, parse-pos) order  -> one uint64 key argsort
* BWT char / SA sample            -> gathers

All input shapes are padded to a coarse bucket grid and true sizes flow in
as device scalars, so compiled programs are reused across inputs (compiles
are expensive on remote-attached devices).  Suffix-equality groups use two
independent 64-bit polynomial hashes computed inside the jit (uint64
cumsum/cumprod wrap mod 2**64 in XLA exactly as in numpy); the numpy path
(ops/bwt.py) byte-verifies group equality and the device path is
cross-checked against it in the test suite.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bwt import BWTResult
from .suffix import (
    compact_indices_jax,
    doubling_with_captures,
    packed_dict_keys,
    sort_impl,
)
from ..constants import Dollar, EndOfDict, EndOfWord


def _bucket(n: int, floor: int = 1 << 12) -> int:
    if n <= floor:
        return floor
    step = max(floor, 1 << (max(int(np.floor(np.log2(n))) - 3, 0)))
    return -(-n // step) * step


def dict_sort_part(dict_flat, w: int, impl: str = "lax",
                   n_levels: int = None, alphabet: str = "byte"):
    """Dict suffix sort + exact equality captures + per-position metadata.

    Shared by assemble_core and the fused programs (ops/fused.py,
    ops/fused_stream.py) — the fused path needs the sort result BEFORE
    the parse-BWT, because it recovers the TRUE byte-lex word ranks from
    the suffix order (word-start suffixes appear in SA order exactly in
    byte-lex word order; prefix-freeness decides every comparison before
    a separator matters), letting the parse stage skip its own byte-lex
    ranking pass entirely.

    The doubling uses k0 packed raw bytes as initial keys (distinct
    ascending negatives for EndOfDict terminator + pads, so the loop is
    bounded by the real suffixes' max LCP, not the pad-run length), and
    captures, per position, the rank blocks [p, p+t) / [p+len-t, p+len)
    at level t = floor_pow2(len): equal-length suffixes are string-equal
    IFF both captured blocks match (sparse-table two-block equality) —
    exact, and one int32 gather per round instead of the emulated-u64
    polynomial-hash machinery.

    Returns (sa_all, C1, C2, suf_len, word_id).
    """
    D = dict_flat.shape[0]
    it = jnp.int32 if D < 2**31 - 2 else jnp.int64
    iota = jnp.arange(D, dtype=it)
    is_eow = dict_flat == EndOfWord
    is_sep = is_eow | (dict_flat == EndOfDict)
    word_id = jnp.concatenate(
        (jnp.zeros(1, it), jnp.cumsum(is_eow.astype(it))[:-1])
    )
    from .suffix import dict_key_plan

    keys0, k0, fp_word = packed_dict_keys(dict_flat, w, alphabet)
    _, t_min, _ = dict_key_plan(w, alphabet)
    # suffix length = distance to the next separator (reverse cummin) —
    # computed BEFORE the sort so the doubling loop can capture
    sep_idx = jnp.where(is_sep, iota, it(D))
    next_sep = jax.lax.cummin(sep_idx, reverse=True)
    suf_len = next_sep - iota
    sa_all, _, C1, C2 = doubling_with_captures(
        keys0, None, suf_len, k0=k0, impl=impl, n_levels=n_levels,
        fp_word=fp_word, t_min=t_min,
    )
    return sa_all, C1, C2, suf_len, word_id


def _emit_decode(fl_ord, j_ord, ls_ord, bwlast, bwsai, m_ilist, it):
    """Shared emission tail: per-lane flags/j/suffix-length in FINAL order
    -> BWT chars + SA samples, via one 3-column row gather from the
    parse-BWT table (bwlast, sai lo/hi)."""
    whole = (fl_ord >> it(8)) != 0
    pch = fl_ord & it(255)
    lo = jax.lax.bitcast_convert_type(
        (bwsai & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32
    )
    hi32 = jax.lax.bitcast_convert_type(
        (bwsai >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32
    )
    P3 = jnp.stack((bwlast.astype(jnp.int32), lo, hi32), axis=1)
    r3 = P3[jnp.clip(j_ord, 0, m_ilist - 1)]
    # EOS rule, content-based (word order independent): among KEPT
    # suffixes, a preceding Dollar can only be T's leading sentinel (the
    # trailing-Dollar run's suffixes are all <= w long), and the char
    # "before" it is the terminator 0x00
    bwtc = jnp.where(
        whole,
        r3[:, 0].astype(jnp.uint8),
        jnp.where(pch == it(Dollar), jnp.uint8(0), pch.astype(jnp.uint8)),
    )
    sai_ord = jax.lax.bitcast_convert_type(r3[:, 1], jnp.uint32).astype(
        jnp.uint64
    ) | (
        jax.lax.bitcast_convert_type(r3[:, 2], jnp.uint32).astype(
            jnp.uint64
        )
        << jnp.uint64(32)
    )
    sa_vals = sai_ord - ls_ord.astype(jnp.uint64)
    return bwtc, sa_vals


def emission_state(
    dict_flat, occs, nsuf_true, w: int, nsuf_b: int, it,
    sorted_state, seg_start=None,
):
    """Nsuf-scale emission bookkeeping shared by assemble_core and the
    fused-mesh pipeline (parallel/fused_mesh.py): kept-suffix compaction
    in lexicographic order, exact equality groups (len + captured rank
    blocks), per-suffix emission counts / first slots / BWT-char flags,
    and the per-group suffix-length table.

    Returns (sa_kept, suf_valid, ls, gid, u, counts, first, flags,
    ls_tab, seg_u) — seg_u = the ilist segment start of each kept
    suffix's word, already gathered (consumers previously re-gathered
    seg_start[u] themselves)."""
    D = dict_flat.shape[0]
    dwords = occs.shape[0]
    sa_all, C1, C2, suf_len, word_id = sorted_state
    # keep suffixes longer than w, in lexicographic order
    kept_idx = compact_indices_jax(suf_len[sa_all] > w, nsuf_b, fill=0)
    sa_kept = sa_all[kept_idx]
    suf_valid = jnp.arange(nsuf_b, dtype=it) < it(nsuf_true)
    # per-kept-suffix metadata as ONE 5-column row gather: six separate
    # random gathers at sa_kept measured 1.35 s standalone at 64 MB on
    # v5e vs 0.30 s for the row form (TPU gathers are row-latency-bound,
    # so columns ride along nearly free)
    prev_sep = jnp.concatenate(
        (jnp.ones(1, jnp.uint8), (dict_flat[:-1] <= 1).astype(jnp.uint8))
    )
    prevch = jnp.concatenate((jnp.zeros(1, jnp.uint8), dict_flat[:-1]))
    flags_src = (prev_sep.astype(it) << it(8)) | prevch.astype(it)
    Z = jnp.stack(
        (
            suf_len.astype(it),
            C1.astype(it),
            C2.astype(it),
            word_id.astype(it),
            flags_src,
        ),
        axis=1,
    )
    R = Z[jnp.clip(sa_kept.astype(it), 0, D - 1)]
    ls, c1k, c2k = R[:, 0], R[:, 1], R[:, 2]
    u = jnp.clip(R[:, 3], 0, jnp.maximum(it(dwords) - 1, 0))
    flags = R[:, 4]
    # equality groups via (len, rank-block pair)
    eq = (
        (ls[1:] == ls[:-1])
        & (c1k[1:] == c1k[:-1])
        & (c2k[1:] == c2k[:-1])
        & suf_valid[1:]
    )
    gid = jnp.concatenate(
        (jnp.zeros(1, it), jnp.cumsum((~eq).astype(it)))
    )
    occs_n = occs.astype(it)
    if seg_start is None:
        seg_start = jnp.concatenate(
            (jnp.ones(1, it), it(1) + jnp.cumsum(occs_n)[:-1])
        )
    else:
        seg_start = seg_start.astype(it)
    # counts + segment starts as one 2-column row gather at u (two
    # separate gathers measured 0.35 s vs 0.14 s batched)
    OS = jnp.stack((occs_n, seg_start), axis=1)
    osr = OS[u]
    counts = jnp.where(suf_valid, osr[:, 0], it(0))
    seg_u = osr[:, 1]
    first = jnp.concatenate((jnp.zeros(1, it), jnp.cumsum(counts)[:-1]))
    # suffix length per group: ls is CONSTANT within an equality group
    # (groups share their length), so a unique .set at group heads
    # replaces the scatter-max (0.24 s -> 0.16 s, and no RMW pass)
    head = jnp.concatenate(
        (jnp.ones(1, bool), gid[1:] != gid[:-1])
    )
    ls_tab = (
        jnp.zeros(nsuf_b, it)
        .at[jnp.where(head & suf_valid, gid, it(nsuf_b))]
        .set(jnp.where(suf_valid, ls, it(0)), unique_indices=True,
             mode="drop")
    )
    return (
        sa_kept, suf_valid, ls, gid, u, counts, first, flags, ls_tab,
        seg_u,
    )


def assemble_core(
    dict_flat, occs, bwlast, ilist, bwsai, nsuf_true, total_true,
    w: int, nsuf_b: int, total_b: int, impl: str = "lax",
    sorted_state=None, seg_start=None, fanout: str = "scatter",
    wide: bool = None, n_levels: int = None, alphabet: str = "byte",
):
    """Traceable emission-sort assembly body — callable standalone (below)
    or inlined into the fused whole-pipeline program (ops/fused.py).
    ``impl`` selects the sort engine (suffix.sort_impl).  ``sorted_state``
    (a dict_sort_part result) and ``seg_start`` let the fused path reuse
    its sort and supply ilist segment starts permuted to ITS word order
    (provisional dedup order); by default both derive from the byte-lex
    dict this standalone path receives."""
    D = dict_flat.shape[0]
    # int32 for every counting scan (indices/counts < 2**31 — the 32-bit
    # width guards fire long before): 64-bit scans lower to u32-pair
    # reduce-windows on TPU, slow and scoped-VMEM-hungry at multi-M sizes
    it = jnp.int32 if max(D, total_b) < 2**31 - 2 else jnp.int64
    if sorted_state is None:
        sorted_state = dict_sort_part(dict_flat, w, impl,
                                      n_levels=n_levels,
                                      alphabet=alphabet)
    (
        sa_kept, suf_valid, ls, gid, u, counts, first, flags, ls_tab,
        seg_u,
    ) = emission_state(
        dict_flat, occs, nsuf_true, w, nsuf_b, it, sorted_state, seg_start
    )
    # emission fan-out WITHOUT jnp.repeat (measured ~0.6 s per repeat over
    # total_b at 16 MB).  Three engines (suffix.fanout_impl):
    #   fill     per-lane values built DIRECTLY: every quantity a lane
    #            needs (gid, flags, ilist-slot base) is constant across
    #            its suffix's emission run, so scatter the per-emitter
    #            DIFFS at the runs' first slots and integrate with one
    #            native-i32 cumsum each — no E_suffix indirection and no
    #            (total_b x k) row gather from the nsuf table at all
    #            (that gather measured 8.6 s in-program at 64 MB vs
    #            1.1 s standalone).
    #   scatter  suffix ids scattered at their segments' first emission
    #            slots (strictly increasing across count>0 segments, so
    #            collision-free) + forward-fill cummax
    #   merge    marker lanes (key first[s]*2, value s+1) merged with slot
    #            lanes (key e*2+1) by ONE i32 kv-sort; cummax carries the
    #            owning suffix onto each slot (max id among markers with
    #            first <= e is exactly the emitter covering e); slot lanes
    #            compact back to e order.  No scatter, at the price of a
    #            2x-length sort + compaction (measured LOSER at 64 MB:
    #            3.1 s vs 0.84 s scatter).
    eidx = jnp.arange(total_b, dtype=it)
    m_ilist = ilist.shape[0]
    e_valid = eidx < it(total_true)
    KB = int(np.ceil(np.log2(m_ilist + 2)))
    nsuf_bits = int(np.ceil(np.log2(nsuf_b + 2)))
    # single-operand (gid, j, flags) key needs nsuf_bits + KB + 9 <= 63;
    # past that the WIDE multi-operand sort below is exact at any width.
    # ``wide`` (static; None = auto) forces the wide path for testing.
    single_ok = nsuf_bits + KB + 9 <= 63 and not wide
    if fanout == "fill" and not single_ok:
        import warnings

        warnings.warn(
            "PFBWT_FANOUT=fill ineligible (emission key exceeds 63 bits"
            " or wide sort forced); using the scatter engine",
            stacklevel=2,
        )
    if fanout == "merge" and nsuf_b + total_b >= 2**30:
        import warnings

        warnings.warn(
            "PFBWT_FANOUT=merge ineligible (nsuf_b + total_b >= 2^30);"
            " using the scatter engine",
            stacklevel=2,
        )
    if fanout == "fill" and single_ok:
        emit = counts > 0
        sidx = jnp.arange(nsuf_b, dtype=it)
        pe_ex = jnp.concatenate(
            (
                jnp.full(1, -1, it),
                jax.lax.cummax(jnp.where(emit, sidx, it(-1)))[:-1],
            )
        )  # index of the last emitter strictly before s

        # previous-emitter values for all three filled quantities in ONE
        # row gather (three separate v[pe_ex] gathers: the biggest was
        # 0.43 s at 64 MB; the row form rides the extra columns free)
        Vv = jnp.stack((gid, flags, seg_u - first), axis=1)
        pvs = jnp.where(
            (pe_ex >= 0)[:, None],
            Vv[jnp.clip(pe_ex, 0, nsuf_b - 1)],
            it(0),
        )
        sc_idx = jnp.where(emit, first, it(total_b))

        def fill_pc(col):
            d = jnp.zeros(total_b, it).at[sc_idx].add(
                jnp.where(emit, Vv[:, col] - pvs[:, col], it(0)),
                mode="drop",
            )
            return jnp.cumsum(d)

        gid_lane = fill_pc(0)
        flags_lane = fill_pc(1)
        base_lane = fill_pc(2)
        slot = jnp.clip(eidx + base_lane, 0, m_ilist - 1)
        E_j = ilist.astype(it)[slot]
        key = (
            (gid_lane.astype(jnp.int64) << (KB + 9))
            | (E_j.astype(jnp.int64) << 9)
            | flags_lane.astype(jnp.int64)
        )
        key_ord = jax.lax.sort(
            jnp.where(e_valid, key, jnp.iinfo(jnp.int64).max)
        )
        fl_ord = (key_ord & 511).astype(it)
        j_ord = ((key_ord >> 9) & jnp.int64((1 << KB) - 1)).astype(it)
        gid_ord = (key_ord >> (KB + 9)).astype(it)
        ls_ord = ls_tab[jnp.clip(gid_ord, 0, nsuf_b - 1)]
        return _emit_decode(
            fl_ord, j_ord, ls_ord, bwlast, bwsai, m_ilist, it
        )
    if fanout == "merge" and nsuf_b + total_b < 2**30:
        mkey = jnp.concatenate((first * 2, eidx * 2 + it(1)))
        mval = jnp.concatenate(
            (jnp.arange(nsuf_b, dtype=it) + 1, jnp.zeros(total_b, it))
        )
        mkey_s, mval_s = jax.lax.sort((mkey, mval), num_keys=1)
        run = jax.lax.cummax(mval_s)
        slot_pos = compact_indices_jax((mkey_s & 1) == 1, total_b, fill=0)
        E_suffix = jnp.clip(run[slot_pos] - 1, 0, nsuf_b - 1)
    else:
        mark = (
            jnp.zeros(total_b, it)
            .at[jnp.where(counts > 0, first, it(total_b))]
            .set(jnp.arange(nsuf_b, dtype=it) + 1, unique_indices=True,
                 mode="drop")
        )
        E_suffix = jnp.clip(jax.lax.cummax(mark) - 1, 0, nsuf_b - 1)
    # legacy engines: one 4-column row gather per lane from the nsuf
    # table (emission base, ilist segment, group id, flags); suffix
    # length recovered post-sort from ls_tab as in the fill engine
    S = jnp.stack((first, seg_u, gid, flags), axis=1)
    rows = S[E_suffix]
    within = eidx - rows[:, 0]
    slot = jnp.clip(rows[:, 1] + within, 0, m_ilist - 1)
    E_j = ilist.astype(it)[slot]
    # final order: (gid, j); invalid emissions sort last
    if impl == "radix" and total_b < 2**31 - 2:
        from .radix import key_bits, radix_argsort_pair

        hi = jnp.where(e_valid, rows[:, 2], it(nsuf_b))
        order = radix_argsort_pair(
            hi,
            E_j,
            nbits_hi=key_bits(nsuf_b),
            nbits_lo=key_bits(int(m_ilist)),
        )
        j_ord = E_j[order]
        gid_ord = rows[:, 2][order]
        ls_ord = ls_tab[jnp.clip(gid_ord, 0, nsuf_b - 1)]
        fl_ord = rows[:, 3][order]
    elif single_ok:
        # SINGLE-OPERAND sort: (gid, j) pairs are unique per lane (one
        # word's ilist positions are distinct; different words' are
        # disjoint), so the 9 flag bits ride BELOW j without affecting
        # order, and gid/j/flags all decode from the sorted key.
        key = (
            (rows[:, 2].astype(jnp.int64) << (KB + 9))
            | (E_j.astype(jnp.int64) << 9)
            | rows[:, 3].astype(jnp.int64)
        )
        key_ord = jax.lax.sort(
            jnp.where(e_valid, key, jnp.iinfo(jnp.int64).max)
        )
        fl_ord = (key_ord & 511).astype(it)
        j_ord = ((key_ord >> 9) & jnp.int64((1 << KB) - 1)).astype(it)
        gid_ord = (key_ord >> (KB + 9)).astype(it)
        ls_ord = ls_tab[jnp.clip(gid_ord, 0, nsuf_b - 1)]
    else:
        # WIDE path: (gid, j) as two sort operands — exact at any width
        # (no packed-key overflow), values ride along (a packed
        # (gid << KB) | j key would silently wrap past 63 bits)
        hi = jnp.where(e_valid, rows[:, 2], it(nsuf_b))
        ls_lane = ls_tab[jnp.clip(rows[:, 2], 0, nsuf_b - 1)]
        _, j_ord, ls_ord, fl_ord = jax.lax.sort(
            (hi, E_j, ls_lane, rows[:, 3]), num_keys=2
        )
    return _emit_decode(fl_ord, j_ord, ls_ord, bwlast, bwsai, m_ilist, it)


_assemble_device = partial(
    jax.jit,
    static_argnames=(
        "w", "nsuf_b", "total_b", "impl", "fanout", "wide", "n_levels",
        "alphabet",
    ),
)(assemble_core)


def dict_alphabet_of_bytes(dict_flat: np.ndarray) -> str:
    """Host-side key-packing mode from the dict byte array itself (the
    standalone/mesh paths receive the dict, not the input stream).
    'byte' by default — see ops.fused.dict_alphabet for the measured
    A/B rationale; PFBWT_DICT_KEYS=acgt3 opts in."""
    import os

    if os.environ.get("PFBWT_DICT_KEYS", "").lower() != "acgt3":
        return "byte"
    allowed = np.zeros(256, dtype=bool)
    allowed[[0, 1, 2, 65, 67, 71, 84]] = True
    return "acgt3" if bool(allowed[dict_flat].all()) else "byte"


def assemble_bwt_jax(
    dict_flat: np.ndarray,
    w: int,
    occs: np.ndarray,
    bwlast: np.ndarray,
    ilist: np.ndarray,
    bwsai,
    n: int,
    want_sa: bool = False,
    want_rssa: bool = False,
    sa_dtype=np.uint64,
) -> BWTResult:
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    occs = np.asarray(occs, dtype=np.int64)
    D = dict_flat.shape[0]
    dwords = int(occs.shape[0])
    nsuf = int((D - 1 - dwords) - dwords * w)
    total = n + 1
    if bwsai is None:
        bwsai = np.zeros(ilist.shape[0], dtype=np.uint64)

    # pad everything to the bucket grid (EndOfDict pads are separators with
    # zero-length suffixes; zero-count words; unreferenced ilist slots)
    D_b = _bucket(D)
    dwords_b = _bucket(dwords)
    m_b = _bucket(ilist.shape[0])
    nsuf_b = _bucket(nsuf)
    total_b = _bucket(total)

    def pad(a, size, fill=0):
        out = np.full(size, fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    from .fused import capture_levels
    from .suffix import fanout_impl

    # invariant guard (ADVICE r4): the max-word-length derivation below —
    # and dict_sort_part's suffix lengths — assume the dict byte array is
    # separator-terminated.  A violation would undersize n_levels and
    # silently corrupt equality captures, so fail loudly here instead.
    if D == 0 or dict_flat[-1] > 1:
        raise ValueError(
            "assemble_bwt_jax: dict_flat must end with a separator byte "
            "(EndOfWord/EndOfDict) — got "
            f"{int(dict_flat[-1]) if D else 'empty'}"
        )
    seps = np.flatnonzero(dict_flat <= 1)
    max_len = (
        int(np.diff(np.concatenate(([-1], seps))).max()) - 1
        if seps.size
        else 1
    )
    alphabet = dict_alphabet_of_bytes(dict_flat)

    bwtc, sa_vals = _assemble_device(
        jnp.asarray(pad(dict_flat, D_b)),
        jnp.asarray(pad(occs, dwords_b)),
        jnp.asarray(pad(np.asarray(bwlast, dtype=np.uint8), m_b)),
        jnp.asarray(pad(np.asarray(ilist, dtype=np.int64), m_b)),
        jnp.asarray(pad(np.asarray(bwsai, dtype=np.uint64), m_b)),
        jnp.int64(nsuf),
        jnp.int64(total),
        w,
        nsuf_b,
        total_b,
        sort_impl(),
        fanout=fanout_impl(),
        # test hook: force the wide multi-operand emission sort
        wide=bool(int(os.environ.get("PFBWT_EMIT_WIDE", "0"))) or None,
        n_levels=capture_levels(max_len, w, alphabet),
        alphabet=alphabet,
    )
    bwtc = np.asarray(bwtc)[:total]
    run_start = np.empty(total, dtype=bool)
    run_start[0] = True
    np.not_equal(bwtc[1:], bwtc[:-1], out=run_start[1:])
    nruns = int(np.count_nonzero(run_start))
    sa_out = None
    ssa = esa = None
    if want_sa or want_rssa:
        sa_np = np.array(sa_vals)[:total]  # copy: device buffers read-only
        sa_np[0] = np.uint64(n)
        if want_rssa:
            rs = np.flatnonzero(run_start)
            re = np.concatenate((rs[1:] - 1, [total - 1]))
            ssa = np.empty(2 * rs.shape[0], dtype=sa_dtype)
            ssa[0::2] = rs.astype(sa_dtype)
            ssa[1::2] = sa_np[rs].astype(sa_dtype)
            esa = np.empty(2 * re.shape[0], dtype=sa_dtype)
            esa[0::2] = re.astype(sa_dtype)
            esa[1::2] = sa_np[re].astype(sa_dtype)
        sa_out = sa_np if want_sa else None
    return BWTResult(bwt=bwtc, sa=sa_out, nruns=nruns, ssa=ssa, esa=esa)
