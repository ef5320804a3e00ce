"""Streamed fused pipeline: chars -> .bwt/.sa at inputs PAST the HBM
ceiling of the monolithic J3.

The monolithic assemble program (ops/fused.py J3 -> bwt_jax.assemble_core)
holds ~10 arrays of length total_b in HBM, capping single-chip input at
~128-192 MB.  This module ports the host out-of-core decomposition
(ops/bwt_mmap.py) onto the device: emissions are generated in dict-suffix
order, along which the suffix-equality group id is NONDECREASING, so the
global (group, ilist-pos) emission sort splits into independent sorts of
group-aligned chunks (reference role: the -m out-of-core mode,
file_wrappers.hpp:36-124 + the final loop of src/pfbwt-f.cpp:209-349).

Three device programs:

  J2  (shared with ops/fused.py)  parse + dictionary rank; HBM-resident.
  J3a dict bytes, generalized dict suffix sort, suffix-equality groups,
      parse-BWT, per-suffix emission prefix (exclusive, int64 via the
      limb-decomposed u64 cumsum), and the GROUP-ALIGNED CHUNK TABLE —
      for a chunk grid of emission targets c*chunk_target, the first
      group-start suffix whose emission prefix reaches each target
      (one small searchsorted over compacted group heads).  Only
      dict-scale (nsuf_b / dict_b / nph_b) arrays live here; nothing of
      length total_b is ever materialized.
  J3e one emission chunk: fan the chunk's suffixes out to their
      occurrences (scatter-at-first-slot + cummax, as assemble_core),
      sort by (gid - gid0, ilist-pos) in one packed int64 key — exact,
      because chunks never split a group — and produce the chunk's BWT
      bytes + SA values plus a u64 checksum.  One compiled program,
      reused for every chunk of every run at the same bucket.

Host syncs: J2 sizing (3 scalars), J3a chunk table (two max_chunks-sized
vectors + max chunk size), then one checksum (bench) or the chunk output
fetches (file-writing mode).  Between J3e dispatches everything stays in
HBM.
"""

import os
from functools import partial
from typing import Optional

import numpy as np

from ..constants import EndOfDict, EndOfWord
from ..utils.errors import die
from ..utils.tables import NTOA_TABLE

_I64MAX = np.int64(np.iinfo(np.int64).max)


def _bucket(n: int, floor: int = 1 << 12) -> int:
    if n <= floor:
        return floor
    step = max(floor, 1 << (max(int(np.floor(np.log2(n))) - 3, 0)))
    return -(-n // step) * step


# --------------------------------------------------------------------------
# J3a: dict-scale state + chunk table
# --------------------------------------------------------------------------


def _dict_state_core(
    Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
    nphrases, D, dict_total, nsuf_true, chunk_target,
    w: int, dict_b: int, nsuf_b: int, max_chunks: int, impl: str = "lax",
    n_levels: int = None, alphabet: str = "byte",
):
    """Everything assemble_core computes BEFORE the total_b fan-out, plus
    the group-aligned chunk table.  Returns HBM-resident dict-scale arrays
    and one small host-fetchable table."""
    import jax
    import jax.numpy as jnp

    from .parse_bwt import parse_bwt_core
    from .suffix import (
        compact_indices_jax,
        cumsum_u64_jax,
        doubling_with_captures,
        packed_dict_keys,
    )

    nph_b = parse_ranks.shape[0]
    tb = Tp.shape[0]
    it = jnp.int32 if max(dict_b, nph_b, nsuf_b) < 2**31 - 2 else jnp.int64
    r = jnp.arange(nph_b, dtype=it)

    # ---- dict byte array (same construction as fused._final_core) ----
    contrib = jnp.where(r < it(D), dict_len.astype(it) + 1, it(0))
    bounds = jnp.cumsum(contrib)
    pidx = jnp.arange(dict_b, dtype=it)
    mark = (
        jnp.zeros(dict_b, it)
        .at[jnp.where(r < it(D), bounds - contrib, it(dict_b))]
        .set(r + 1, unique_indices=True, mode="drop")
    )
    word = jnp.clip(jax.lax.cummax(mark) - 1, 0, nph_b - 1)
    W3 = jnp.stack(
        (bounds - contrib, dict_len.astype(it), dict_start.astype(it)),
        axis=1,
    )
    wrows = W3[word]
    within = pidx - wrows[:, 0]
    ch = jnp.where(
        within < wrows[:, 1],
        Tp[jnp.clip(wrows[:, 2] + within, 0, tb - 1)],
        jnp.uint8(EndOfWord),
    )
    dict_flat = jnp.where(pidx < dict_total - 1, ch, jnp.uint8(EndOfDict))

    # ---- generalized dict suffix order + equality groups ----
    is_eow = dict_flat == EndOfWord
    is_sep = is_eow | (dict_flat == EndOfDict)
    word_id = jnp.concatenate(
        (jnp.zeros(1, it), jnp.cumsum(is_eow.astype(it))[:-1])
    )
    dwords = jnp.sum(is_eow.astype(it))
    sep_idx = jnp.where(is_sep, pidx, it(dict_b))
    next_sep = jax.lax.cummin(sep_idx, reverse=True)
    suf_len = next_sep - pidx
    # packed initial keys + exact suffix-equality via rank-block /
    # fingerprint captures (see bwt_jax.assemble_core) — no u64 hashes
    from .suffix import dict_key_plan

    keys0, k0, fp_word = packed_dict_keys(dict_flat, w, alphabet)
    _, t_min, _ = dict_key_plan(w, alphabet)
    sa_all, _, C1, C2 = doubling_with_captures(
        keys0, None, suf_len, k0=k0, impl=impl, n_levels=n_levels,
        fp_word=fp_word, t_min=t_min,
    )
    kept_idx = compact_indices_jax(suf_len[sa_all] > w, nsuf_b, fill=0)
    sa_kept = sa_all[kept_idx].astype(it)
    suf_valid = jnp.arange(nsuf_b, dtype=it) < it(nsuf_true)
    # one 4-column row gather instead of four separate random gathers at
    # sa_kept (row-latency-bound on TPU; see bwt_jax.emission_state)
    Z4 = jnp.stack(
        (suf_len.astype(it), C1.astype(it), C2.astype(it),
         word_id.astype(it)),
        axis=1,
    )
    R4 = Z4[jnp.clip(sa_kept, 0, dict_b - 1)]
    ls, c1k, c2k = R4[:, 0], R4[:, 1], R4[:, 2]
    eq = (
        (ls[1:] == ls[:-1])
        & (c1k[1:] == c1k[:-1])
        & (c2k[1:] == c2k[:-1])
        & suf_valid[1:]
    )
    gid = jnp.concatenate((jnp.zeros(1, it), jnp.cumsum((~eq).astype(it))))
    u = jnp.clip(R4[:, 3], 0, jnp.maximum(dwords - 1, 0))

    # ---- true byte-lex ranks from the suffix order (see fused.py) ----
    prev_sep0 = jnp.concatenate((jnp.ones(1, bool), dict_flat[:-1] <= 1))
    is_wstart = prev_sep0 & (pidx.astype(jnp.int64) < dict_total - 1)
    wsa = compact_indices_jax(is_wstart[sa_all], nph_b, fill=0)
    prov_in_lex = word_id[jnp.clip(sa_all[wsa], 0, dict_b - 1)].astype(it)
    lex_valid = jnp.arange(nph_b, dtype=it) < it(D)
    lex_of_prov = (
        jnp.zeros(nph_b, it)
        .at[jnp.where(lex_valid, jnp.clip(prov_in_lex, 0, nph_b - 1),
                      it(nph_b))]
        .set(jnp.arange(nph_b, dtype=it), unique_indices=True,
             mode="drop")
    )
    ranks_true = jnp.where(
        parse_ranks > 0,
        lex_of_prov[
            jnp.clip(parse_ranks - 1, 0, nph_b - 1)
        ].astype(jnp.int64) + 1,
        0,
    )

    # ---- parse-BWT (nph-scale) ----
    bwlast, ilist, bwsai, _ = parse_bwt_core(
        ranks_true, last, sai, nphrases, impl=impl
    )
    occs_n = occs.astype(it)
    # ilist segment starts live in LEX rank space; permute to the
    # provisional word ids the dict suffixes carry
    occs_lex = jnp.where(
        lex_valid, occs_n[jnp.clip(prov_in_lex, 0, nph_b - 1)], it(0)
    )
    seg_lex = jnp.concatenate(
        (jnp.ones(1, it), it(1) + jnp.cumsum(occs_lex)[:-1])
    )
    seg_start = seg_lex[jnp.clip(lex_of_prov, 0, nph_b - 1)]

    # ---- emission prefix (exclusive) per kept suffix, int64-exact ----
    counts = jnp.where(suf_valid, occs_n[u], it(0))
    incl = cumsum_u64_jax(counts.astype(jnp.uint64)).astype(jnp.int64)
    emis_prefix = jnp.concatenate((jnp.zeros(1, jnp.int64), incl[:-1]))
    total = incl[-1]

    # ---- group-aligned chunk table ----
    # group-start suffixes in order; pads each open a group with 0 count
    is_head = jnp.concatenate(
        (jnp.ones(1, bool), gid[1:] != gid[:-1])
    ) & suf_valid
    sidx = jnp.arange(nsuf_b, dtype=it)
    gs_idx = compact_indices_jax(is_head, nsuf_b, fill=nsuf_b)
    gs_pref = jnp.where(
        gs_idx < nsuf_b, emis_prefix[jnp.clip(gs_idx, 0, nsuf_b - 1)],
        _I64MAX,
    )
    c = jnp.arange(max_chunks + 1, dtype=jnp.int64)
    targets = c * chunk_target
    # first group head whose prefix >= target; past-the-end -> nsuf slot
    pick = jnp.searchsorted(gs_pref, jnp.minimum(targets, total), side="left")
    s_starts = jnp.where(
        targets >= total, it(nsuf_true),
        gs_idx[jnp.clip(pick, 0, nsuf_b - 1)].astype(it),
    )
    bases = jnp.where(
        targets >= total, total,
        emis_prefix[jnp.clip(s_starts, 0, nsuf_b - 1)],
    )
    max_m = jnp.max(bases[1:] - bases[:-1])
    table = jnp.concatenate(
        (
            s_starts.astype(jnp.int64),
            bases,
            jnp.stack((max_m, total)),
        )
    )  # ONE small fetch sizes every chunk
    # word-start flags the chunk program needs for the BWT char rule
    prev_sep = jnp.concatenate((jnp.ones(1, bool), dict_flat[:-1] <= 1))
    return (
        dict_flat, sa_kept, gid, u, ls, emis_prefix,
        seg_start, bwlast, ilist, bwsai, prev_sep, table,
    )


_state_jits = {}


# --------------------------------------------------------------------------
# J3e: one emission chunk
# --------------------------------------------------------------------------


def _chunk_core(
    dict_flat, sa_kept, gid, u, ls, emis_prefix,
    seg_start, bwlast, ilist, bwsai, prev_sep,
    s0, s1, base, m_true, n_text,
    chunk_b: int, impl: str = "lax",
):
    """Emit slots [base, base+m_true) of the final BWT/SA: the emissions of
    kept suffixes [s0, s1), which by construction cover whole equality
    groups.  Exact: the global key (gid, j) restricted to whole groups is
    (gid - gid[s0], j), sorted per chunk."""
    import jax
    import jax.numpy as jnp

    nsuf_b = sa_kept.shape[0]
    m_ilist = ilist.shape[0]
    D_b = dict_flat.shape[0]
    it = sa_kept.dtype.type  # np scalar ctor (int32/int64)
    l = jnp.arange(chunk_b, dtype=it)

    # local suffix window [s0, s0+chunk_b): CONTIGUOUS — every per-suffix
    # array is read with a dynamic_slice (a copy), never a gather
    def win(a, fill=0):
        pad = jnp.full(chunk_b, fill, a.dtype)
        return jax.lax.dynamic_slice(
            jnp.concatenate((a, pad)), (s0.astype(jnp.int32),), (chunk_b,)
        )

    win_valid = (s0.astype(it) + l) < s1.astype(it)
    first_local = (win(emis_prefix) - base).astype(it)
    gid_w = win(gid)
    segu_w = seg_start[win(u)]  # chunk-sized gather from the nph array
    pos_w = win(sa_kept)
    ls_w = win(ls)
    # dict-side facts folded per-suffix (chunk-sized gathers)
    prevch_d = jnp.concatenate((jnp.zeros(1, jnp.uint8), dict_flat[:-1]))
    pw = jnp.clip(pos_w, 0, D_b - 1)
    flags_w = (prev_sep[pw].astype(it) << it(8)) | prevch_d[pw].astype(it)
    # equal first_local values collide in this scatter (zero-count
    # suffixes share their slot with the next emitter, which — prefix
    # being strictly increased only by emitters — is always the LAST of
    # the equal-prefix run): .max picks it deterministically.
    mark = (
        jnp.zeros(chunk_b, it)
        .at[jnp.where(win_valid & (first_local < chunk_b),
                      first_local, it(chunk_b))]
        .max(l + 1, mode="drop")
    )
    E_local = jnp.clip(jax.lax.cummax(mark) - 1, 0, chunk_b - 1)
    e_valid = l < m_true.astype(it)
    # suffix length is a function of gid (group equality includes length
    # equality): recover it post-sort from a chunk-local table.  Local
    # gids are < chunk_b (every group in the chunk has >= 1 emission and
    # the chunk holds m_true <= chunk_b emissions).
    lgid = gid_w - gid_w[0]
    ls_ltab = (
        jnp.zeros(chunk_b, it)
        .at[jnp.where(win_valid & (lgid < chunk_b), lgid, it(chunk_b))]
        .max(jnp.where(win_valid, ls_w, it(0)), mode="drop")
    )
    S = jnp.stack((first_local, segu_w, gid_w, flags_w), axis=1)
    rows = S[E_local]
    within = l - rows[:, 0]
    slot = jnp.clip(rows[:, 1] + within, 0, m_ilist - 1)
    E_j = ilist.astype(it)[slot]
    KB = int(np.ceil(np.log2(m_ilist + 2)))
    cb_bits = int(np.ceil(np.log2(chunk_b + 2)))
    lg64 = (rows[:, 2] - gid_w[0]).astype(jnp.int64)
    if cb_bits + KB + 9 <= 63:
        # SINGLE-OPERAND sort: (gid, j) unique per lane, so the 9 flag
        # bits ride below j without affecting order; gid/j/flags decode
        # from the sorted key.
        key = (lg64 << (KB + 9)) | (E_j.astype(jnp.int64) << 9) | rows[
            :, 3
        ].astype(jnp.int64)
        key_ord = jax.lax.sort(jnp.where(e_valid, key, _I64MAX))
        fl_ord = (key_ord & 511).astype(it)
        j_ord = ((key_ord >> 9) & jnp.int64((1 << KB) - 1)).astype(it)
        gid_ord = (key_ord >> (KB + 9)).astype(it)
        ls_ord = ls_ltab[jnp.clip(gid_ord, 0, chunk_b - 1)]
    else:
        key = (lg64 << KB) | E_j.astype(jnp.int64)
        key = jnp.where(e_valid, key, _I64MAX)
        ls_lane = ls_ltab[jnp.clip(rows[:, 2] - gid_w[0], 0, chunk_b - 1)]
        key_ord, ls_ord, fl_ord = jax.lax.sort(
            (key, ls_lane, rows[:, 3]), num_keys=1
        )
        j_ord = (key_ord & jnp.int64((1 << KB) - 1)).astype(it)
    lo = jax.lax.bitcast_convert_type(
        (bwsai & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32
    )
    hi32 = jax.lax.bitcast_convert_type(
        (bwsai >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32
    )
    P3 = jnp.stack((bwlast.astype(jnp.int32), lo, hi32), axis=1)
    r3 = P3[jnp.clip(j_ord, 0, m_ilist - 1)]
    whole = (fl_ord >> it(8)) != 0
    pch = fl_ord & it(255)
    # EOS rule, content-based (word order independent): among KEPT
    # suffixes a preceding Dollar can only be T's leading sentinel
    from ..constants import Dollar

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
    # global slot 0 is the terminator's rotation: SA value = n
    gpos = base + l
    sa_vals = jnp.where(gpos == 0, n_text.astype(jnp.uint64), sa_vals)
    ev = e_valid
    checksum = (
        jnp.sum(jnp.where(ev, bwtc.astype(jnp.uint64), 0))
        + jnp.sum(jnp.where(ev, sa_vals, jnp.uint64(0)))
    )
    # invariant guard (ADVICE r3): local gids must fit the chunk-local
    # ls table — a violation would silently zero a group's suffix length
    # via the scatter drop-guard above.  Count offenders so the driver
    # can fail loudly instead (rides the existing checksum fetch).
    bad = jnp.sum(
        jnp.where(win_valid & ((lgid < 0) | (lgid >= it(chunk_b))),
                  jnp.int32(1), jnp.int32(0))
    )
    return bwtc, sa_vals, checksum, bad


_chunk_jits = {}


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def pfbwt_fused_stream(
    C: np.ndarray,
    w: int,
    p: int,
    bwt_fp=None,
    sa_fp=None,
    sa_dtype=np.dtype("<u8"),
    chunk_target: int = 48 << 20,
    max_chunks: int = 256,
    fetch: Optional[bool] = None,
    want_rssa: bool = False,
):
    """Whole-pipeline streamed device run.

    With file objects: writes .bwt/.sa chunk by chunk (bounded HBM AND
    bounded host RAM) and returns (nruns, total, checksum[, ssa, esa]).
    Without: bench mode — only per-chunk checksums leave HBM; returns
    (None, total, checksum).  ``want_rssa`` additionally collects the
    .ssa/.esa run-length samples across chunk boundaries (the streaming
    bookkeeping of ops/bwt_mmap._RunState, pfbwt-f.cpp:304-319 semantics).
    """
    import jax
    import jax.numpy as jnp

    from . import fused
    from .bwt_mmap import _RunState
    from .suffix import sort_impl

    if fetch is None:
        fetch = bwt_fp is not None or sa_fp is not None or want_rssa

    # same validation gate as pfbwt_fused_device: _parse_core's arithmetic
    # NTOA mapping assumes pre-validated input — without this, invalid
    # bytes (IUPAC wobble codes etc.) would silently hash as 'A' instead
    # of hitting the reference's fatal invalid-character path
    codes_chk = NTOA_TABLE[C]
    if codes_chk.size and codes_chk.max() > 3:
        bad = C[codes_chk > 3][0]
        die(f"invalid character {bad}/{chr(bad)} in input "
            "(use --non-acgt-to-a)")
    del codes_chk
    alphabet = fused.dict_alphabet(C)

    C_len = int(C.shape[0])
    n = C_len
    n_b = fused._bucket(max(C_len, 1), 1 << 16)
    chars_p = np.empty(n_b, dtype=np.uint8)
    chars_p[:C_len] = C
    chars_p[C_len:] = ord("A")
    dev_chars = jax.device_put(chars_p)

    nph_b = fused._bucket(fused.speculative_nphrases(C_len, p))

    # Streamed J2 (chunked lax.scan, no T'-length u64 arrays): the
    # monolithic J2's substring-hash machinery caps on-chip input at
    # ~256 MB (~8.6 GB HBM); past that the chunked form is mandatory.
    # Below the wall the monolithic J2 measures faster (256 MB warm e2e:
    # 70-85 s streamed vs ~70 s monolithic in r4), so the auto switch
    # sits just past 256 MB+pads.  PFBWT_J2_STREAM=1/0 forces it.
    j2s_env = os.environ.get("PFBWT_J2_STREAM", "auto").lower()
    use_j2_stream = (
        j2s_env == "1"
        or (j2s_env not in ("0", "1") and C_len > (288 << 20))
    )
    if use_j2_stream:
        j2_chunk = int(
            os.environ.get("PFBWT_J2_CHUNK", str(64 << 20))
        )
        state, ncuts, D, dict_total, max_len = fused.run_parse_stream(
            dev_chars, C_len, w, p, nph_b, chunk_target=j2_chunk
        )
        if ncuts == 0:
            die("error: only one dict word total. "
                "Re-run with a smaller p modulus")
        nphrases = ncuts + 1
    else:
        scan_impl = fused._default_scan_impl(w, p)

        def run_parse(nph_b):
            key2 = (nph_b, w, p, scan_impl, "stream-mono")
            if key2 not in fused._parse_jits:
                fused._parse_jits[key2] = jax.jit(
                    partial(fused._parse_core, w=w, p=p, nph_b=nph_b,
                            scan_impl=scan_impl)
                )
            state = fused._parse_jits[key2](dev_chars, jnp.int64(C_len))
            meta = np.asarray(state[-1])  # SYNC 1
            return (state, int(meta[0]), int(meta[1]), int(meta[2]),
                    int(meta[3]))

        state, ncuts, D, dict_total, max_len = run_parse(nph_b)
        if ncuts == 0:
            die("error: only one dict word total. "
                "Re-run with a smaller p modulus")
        if ncuts + 1 > nph_b:
            nph_b = fused._bucket(ncuts + 1)
            state, ncuts, D, dict_total, max_len = run_parse(nph_b)
        nphrases = ncuts + 1
    n_levels = fused.capture_levels(max_len, w, alphabet)
    (Tp, parse_ranks, occs, dict_start, dict_len, last, sai, _) = state

    nsuf = (dict_total - 1 - D) - D * w
    dict_b = fused._bucket(dict_total)
    nsuf_b = fused._bucket(nsuf)
    impl = sort_impl()

    keyA = (w, dict_b, nsuf_b, nph_b, max_chunks, impl, n_levels,
            alphabet)
    if keyA not in _state_jits:
        _state_jits[keyA] = jax.jit(
            partial(
                _dict_state_core, w=w, dict_b=dict_b, nsuf_b=nsuf_b,
                max_chunks=max_chunks, impl=impl, n_levels=n_levels,
                alphabet=alphabet,
            )
        )
    (
        dict_flat, sa_kept, gid, u, ls, emis_prefix,
        seg_start, bwlast, ilist, bwsai, prev_sep, table_d,
    ) = _state_jits[keyA](
        Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
        jnp.int64(nphrases), jnp.int64(D), jnp.int64(dict_total),
        jnp.int64(nsuf), jnp.int64(chunk_target),
    )
    # the text and per-occurrence parse buffers are dead once J3a holds
    # them — drop the references so HBM can reclaim (execution keeps the
    # underlying buffers alive until the program completes)
    del Tp, parse_ranks, occs, dict_start, dict_len, last, sai, state
    table = np.asarray(table_d)  # SYNC 2: chunk table
    s_starts = table[: max_chunks + 1]
    bases = table[max_chunks + 1 : 2 * (max_chunks + 1)]
    max_m, total = int(table[-2]), int(table[-1])
    if total != n + 1:
        die(f"streamed assembly sizing bug: total {total} != n+1 {n + 1}")
    if bases[-1] != total:
        die(
            f"streamed assembly needs more than {max_chunks} chunks at "
            f"chunk_target={chunk_target} (covered {bases[-1]}/{total}); "
            "raise chunk_target or max_chunks"
        )
    chunk_b = fused._bucket(max(max_m, 1))

    keyE = (chunk_b, nsuf_b, nph_b, dict_b, impl)
    if keyE not in _chunk_jits:
        _chunk_jits[keyE] = jax.jit(
            partial(_chunk_core, chunk_b=chunk_b, impl=impl)
        )
    run_chunk = _chunk_jits[keyE]

    checksum = np.uint64(0)
    runs = _RunState(np.dtype(sa_dtype))
    need_sa_vals = sa_fp is not None or want_rssa
    pending = []

    def drain(slot):
        nonlocal checksum
        bwt_d, sa_d, ck_d, bad_d, m_c, base_c = slot
        checksum += np.uint64(np.asarray(ck_d))
        nbad = int(np.asarray(bad_d))
        if nbad:
            die(
                f"streamed assembly invariant violation: {nbad} local "
                "gids exceed the chunk-local table (chunk table sizing "
                "bug — please report)"
            )
        if not fetch:
            return
        bwtc = np.asarray(bwt_d)[:m_c]
        if bwt_fp is not None:
            bwt_fp.write(bwtc.tobytes())
        sa_np = None
        if need_sa_vals:
            sa_np = np.asarray(sa_d)[:m_c]
            if sa_fp is not None:
                sa_fp.write(sa_np.astype(sa_dtype).tobytes())
        runs.feed(base_c, bwtc, sa_np if want_rssa else None)

    for c in range(max_chunks):
        m_c = int(bases[c + 1] - bases[c])
        if m_c == 0:
            continue
        out = run_chunk(
            dict_flat, sa_kept, gid, u, ls, emis_prefix,
            seg_start, bwlast, ilist, bwsai, prev_sep,
            jnp.int64(int(s_starts[c])), jnp.int64(int(s_starts[c + 1])),
            jnp.int64(int(bases[c])), jnp.int64(m_c), jnp.int64(n),
        )
        pending.append(
            (out[0], out[1], out[2], out[3], m_c, int(bases[c]))
        )
        if fetch and len(pending) >= 2:
            # double-buffer: overlap fetch with compute
            drain(pending.pop(0))
    if not fetch:
        # bench mode: chunk dispatches queued asynchronously above; ONE
        # stacked fetch replaces per-chunk checksum syncs (each tiny
        # D2H costs a full tunnel RTT — ~2-4 s apiece on this rig,
        # ~40-80 s across an 11-chunk 512 MB run)
        scalars = np.asarray(jnp.stack(
            [jnp.stack((p[2], p[3].astype(jnp.uint64))) for p in pending]
        ))
        checksum = np.uint64(0)
        for (ck_v, bad_v) in scalars:
            checksum += np.uint64(ck_v)
            if int(bad_v):
                die(
                    "streamed assembly invariant violation: local gids "
                    "exceed the chunk-local table (chunk table sizing "
                    "bug — please report)"
                )
        return None, total, int(checksum)
    while pending:
        drain(pending.pop(0))
    if want_rssa:
        ssa, esa = runs.finish(total)
        return runs.nruns, total, int(checksum), ssa, esa
    return runs.nruns, total, int(checksum)
