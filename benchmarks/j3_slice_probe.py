"""Truncated-prefix attribution of the fused J3 program.

The component probe (chip_probe.py) times candidate ops standalone, but
their sum (~8 s) falls well short of the real J3 wall (14.7 s at 64 MB)
— fusion, rematerialization, and buffer pressure inside the ONE big jit
change the picture.  This probe compiles PREFIXES of the actual
_final_core body and times each as its own program; the increment
between consecutive prefixes attributes that slice's true in-program
cost (modulo XLA dead-code elimination, which each prefix defeats by
returning a checksum of its live arrays).

Usage: [PFBWT_BENCH_MB=64] python benchmarks/j3_slice_probe.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "64"))
CACHE = f"/tmp/pfbwtf_tpu_bench_{SIZE_MB}mb"
W, P = 10, 100
REPS = 2


def t(label, fn):
    out = fn()  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:52s} {min(times)*1e3:9.1f} ms", flush=True)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops import fused
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream

    fasta = CACHE + ".pan.fa"
    if not os.path.exists(fasta):
        sys.exit(f"missing bench input {fasta}; run bench.py first")
    records = read_fasta_bytes(fasta)
    C, _, _ = build_stream(records, ParserParams(w=W, p=P))

    C_len = int(C.shape[0])
    n_b = fused._bucket(max(C_len, 1), 1 << 16)
    chars_p = np.full(n_b, ord("A"), dtype=np.uint8)
    chars_p[:C_len] = C
    dev_chars = jax.device_put(chars_p)

    nph_b = fused._bucket(fused.speculative_nphrases(C_len, P))
    key2 = (nph_b, W, P)
    if key2 not in fused._parse_jits:
        fused._parse_jits[key2] = jax.jit(
            partial(fused._parse_core, w=W, p=P, nph_b=nph_b)
        )
    state = fused._parse_jits[key2](dev_chars, jnp.int64(C_len))
    meta = np.asarray(state[-1])
    ncuts, D, dict_total = int(meta[0]), int(meta[1]), int(meta[2])
    (Tp, parse_ranks, occs, dict_start, dict_len, last, sai, _) = state
    nphrases = ncuts + 1
    nsuf = (dict_total - 1 - D) - D * W
    total = C_len + 1
    dict_b = fused._bucket(dict_total)
    nsuf_b = fused._bucket(nsuf)
    total_b = fused._bucket(total)
    print(f"input {SIZE_MB} MB: dict_b={dict_b} nsuf_b={nsuf_b} "
          f"total_b={total_b} nph_b={nph_b}", flush=True)

    from pfbwtf_tpu.constants import Dollar, EndOfDict, EndOfWord
    from pfbwtf_tpu.ops.bwt_jax import dict_sort_part
    from pfbwtf_tpu.ops.parse_bwt import parse_bwt_core
    from pfbwtf_tpu.ops.suffix import compact_indices_jax

    tb = int(Tp.shape[0])
    it = jnp.int32

    def upto_dictflat(Tp, dict_start, dict_len, D):
        r = jnp.arange(nph_b, dtype=it)
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
        dict_flat = jnp.where(
            pidx < it(dict_total - 1), ch, jnp.uint8(EndOfDict))
        return dict_flat

    def upto_sort(Tp, dict_start, dict_len, D):
        dict_flat = upto_dictflat(Tp, dict_start, dict_len, D)
        ss = dict_sort_part(dict_flat, W, "lax")
        sa_all, C1, C2, suf_len, word_id = ss
        return dict_flat, ss

    def upto_ranks(Tp, parse_ranks, occs, dict_start, dict_len, D):
        dict_flat, ss = upto_sort(Tp, dict_start, dict_len, D)
        sa_all, C1, C2, suf_len, word_id = ss
        pidx = jnp.arange(dict_b, dtype=it)
        prev_sep0 = jnp.concatenate(
            (jnp.ones(1, bool), dict_flat[:-1] <= 1))
        is_wstart = prev_sep0 & (pidx.astype(jnp.int64) < dict_total - 1)
        wsa = compact_indices_jax(is_wstart[sa_all], nph_b, fill=0)
        prov_in_lex = word_id[
            jnp.clip(sa_all[wsa], 0, dict_b - 1)].astype(it)
        lex_valid = jnp.arange(nph_b, dtype=it) < it(D)
        lex_of_prov = (
            jnp.zeros(nph_b, it)
            .at[jnp.where(lex_valid,
                          jnp.clip(prov_in_lex, 0, nph_b - 1), it(nph_b))]
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
        return dict_flat, ss, ranks_true, prov_in_lex, lex_of_prov

    def upto_pbwt(Tp, parse_ranks, occs, dict_start, dict_len, last,
                  sai, D):
        dict_flat, ss, ranks_true, prov_in_lex, lex_of_prov = upto_ranks(
            Tp, parse_ranks, occs, dict_start, dict_len, D)
        bwlast, ilist, bwsai, _ = parse_bwt_core(
            ranks_true, last, sai, jnp.int64(nphrases), impl="lax")
        lex_valid = jnp.arange(nph_b, dtype=it) < it(D)
        occs_lex = jnp.where(
            lex_valid,
            occs[jnp.clip(prov_in_lex, 0, nph_b - 1)].astype(it), it(0))
        seg_lex = jnp.concatenate(
            (jnp.ones(1, it), it(1) + jnp.cumsum(occs_lex)[:-1]))
        seg_prov = seg_lex[jnp.clip(lex_of_prov, 0, nph_b - 1)]
        return dict_flat, ss, bwlast, ilist, bwsai, seg_prov

    def upto_fanout(Tp, parse_ranks, occs, dict_start, dict_len, last,
                    sai, D):
        dict_flat, ss, bwlast, ilist, bwsai, seg_prov = upto_pbwt(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        sa_all, C1, C2, suf_len, word_id = ss
        kept_idx = compact_indices_jax(suf_len[sa_all] > W, nsuf_b, fill=0)
        sa_kept = sa_all[kept_idx]
        suf_valid = jnp.arange(nsuf_b, dtype=it) < it(nsuf)
        ls = suf_len[sa_kept].astype(it)
        c1k = C1[sa_kept]
        c2k = C2[sa_kept]
        eq = (
            (ls[1:] == ls[:-1])
            & (c1k[1:] == c1k[:-1])
            & (c2k[1:] == c2k[:-1])
            & suf_valid[1:]
        )
        gid = jnp.concatenate(
            (jnp.zeros(1, it), jnp.cumsum((~eq).astype(it))))
        u = jnp.clip(word_id[sa_kept].astype(it), 0, nph_b - 1)
        counts = jnp.where(suf_valid, occs.astype(it)[u], it(0))
        first = jnp.concatenate(
            (jnp.zeros(1, it), jnp.cumsum(counts)[:-1]))
        eidx = jnp.arange(total_b, dtype=it)
        mark = (
            jnp.zeros(total_b, it)
            .at[jnp.where(counts > 0, first, it(total_b))]
            .set(jnp.arange(nsuf_b, dtype=it) + 1, unique_indices=True,
                 mode="drop")
        )
        E_suffix = jnp.clip(jax.lax.cummax(mark) - 1, 0, nsuf_b - 1)
        return (dict_flat, ss, bwlast, ilist, bwsai, seg_prov, sa_kept,
                gid, u, ls, first, E_suffix, eidx)

    def upto_rows(Tp, parse_ranks, occs, dict_start, dict_len, last,
                  sai, D):
        (dict_flat, ss, bwlast, ilist, bwsai, seg_prov, sa_kept, gid, u,
         ls, first, E_suffix, eidx) = upto_fanout(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        prev_sep = jnp.concatenate(
            (jnp.ones(1, jnp.uint8),
             (dict_flat[:-1] <= 1).astype(jnp.uint8)))
        prevch = jnp.concatenate(
            (jnp.zeros(1, jnp.uint8), dict_flat[:-1]))
        sk = jnp.clip(sa_kept.astype(it), 0, dict_b - 1)
        flags = (prev_sep[sk].astype(it) << it(8)) | prevch[sk].astype(it)
        ls_tab = jnp.zeros(nsuf_b, it).at[gid].max(
            ls, mode="promise_in_bounds")
        S = jnp.stack((first, seg_prov[u], gid, flags), axis=1)
        rows = S[E_suffix]
        within = eidx - rows[:, 0]
        m_ilist = ilist.shape[0]
        slot = jnp.clip(rows[:, 1] + within, 0, m_ilist - 1)
        E_j = ilist.astype(it)[slot]
        return (bwlast, bwsai, ilist, rows, E_j, ls_tab, eidx)

    def upto_sortfinal(Tp, parse_ranks, occs, dict_start, dict_len, last,
                       sai, D):
        (bwlast, bwsai, ilist, rows, E_j, ls_tab, eidx) = upto_rows(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        m_ilist = ilist.shape[0]
        e_valid = eidx < it(total)
        KB = int(np.ceil(np.log2(m_ilist + 2)))
        key = (
            (rows[:, 2].astype(jnp.int64) << (KB + 9))
            | (E_j.astype(jnp.int64) << 9)
            | rows[:, 3].astype(jnp.int64)
        )
        key_ord = jax.lax.sort(
            jnp.where(e_valid, key, jnp.iinfo(jnp.int64).max))
        fl_ord = (key_ord & 511).astype(it)
        j_ord = ((key_ord >> 9) & jnp.int64((1 << KB) - 1)).astype(it)
        gid_ord = (key_ord >> (KB + 9)).astype(it)
        ls_ord = ls_tab[jnp.clip(gid_ord, 0, nsuf_b - 1)]
        return bwlast, bwsai, ilist, fl_ord, j_ord, ls_ord

    def chk(*arrs):
        # FULL-array reductions: a [:8] slice lets XLA slice gathers /
        # elementwise chains down to 8 lanes (observed — increments then
        # attribute work to the wrong slice); full sums force every lane
        # while costing only a cheap reduction
        acc = jnp.int64(0)
        for a in arrs:
            if a.dtype == jnp.uint64:
                acc = acc + jnp.sum(a.astype(jnp.int64))
            elif a.dtype == jnp.int64:
                acc = acc + jnp.sum(a)
            else:
                acc = acc + jnp.sum(a.astype(jnp.int32)).astype(jnp.int64)
        return acc

    D64 = jnp.int64(D)

    def fill_state(Tp, parse_ranks, occs, dict_start, dict_len, last,
                   sai, D):
        """Shared prefix for the fill-engine slices: emission state up to
        (emit, pe_ex, first, gid, u, flags, ls_tab, seg_prov)."""
        (dict_flat, ss, bwlast, ilist, bwsai, seg_prov, sa_kept, gid, u,
         ls, first, _E_suffix, eidx) = upto_fanout(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        counts = jnp.where(
            jnp.arange(nsuf_b, dtype=it) < it(nsuf),
            occs.astype(it)[u], it(0))
        prev_sep = jnp.concatenate(
            (jnp.ones(1, jnp.uint8),
             (dict_flat[:-1] <= 1).astype(jnp.uint8)))
        prevch = jnp.concatenate(
            (jnp.zeros(1, jnp.uint8), dict_flat[:-1]))
        sk = jnp.clip(sa_kept.astype(it), 0, dict_b - 1)
        flags = (prev_sep[sk].astype(it) << it(8)) | prevch[sk].astype(it)
        ls_tab = jnp.zeros(nsuf_b, it).at[gid].max(
            ls, mode="promise_in_bounds")
        emit = counts > 0
        sidx = jnp.arange(nsuf_b, dtype=it)
        pe_ex = jnp.concatenate(
            (jnp.full(1, -1, it),
             jax.lax.cummax(jnp.where(emit, sidx, it(-1)))[:-1]))

        def fill_pc(v):
            pv = jnp.where(
                pe_ex >= 0, v[jnp.clip(pe_ex, 0, nsuf_b - 1)], it(0))
            d = jnp.zeros(total_b, it).at[
                jnp.where(emit, first, it(total_b))
            ].add(jnp.where(emit, v - pv, it(0)), mode="drop")
            return jnp.cumsum(d)

        return (fill_pc, gid, flags, seg_prov, u, first, ls_tab,
                bwlast, ilist, bwsai, eidx)

    def upto_fill_lanes(Tp, parse_ranks, occs, dict_start, dict_len,
                        last, sai, D):
        (fill_pc, gid, flags, seg_prov, u, first, ls_tab, bwlast, ilist,
         bwsai, eidx) = fill_state(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        gid_lane = fill_pc(gid)
        flags_lane = fill_pc(flags)
        base_lane = fill_pc(seg_prov[u] - first)
        return (gid_lane, flags_lane, base_lane, ls_tab, bwlast, ilist,
                bwsai, eidx)

    def upto_fill_ej(Tp, parse_ranks, occs, dict_start, dict_len, last,
                     sai, D):
        (gid_lane, flags_lane, base_lane, ls_tab, bwlast, ilist, bwsai,
         eidx) = upto_fill_lanes(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        m_ilist = ilist.shape[0]
        slot = jnp.clip(eidx + base_lane, 0, m_ilist - 1)
        E_j = ilist.astype(it)[slot]
        return (gid_lane, flags_lane, E_j, ls_tab, bwlast, ilist, bwsai,
                eidx)

    def upto_fill_sort(Tp, parse_ranks, occs, dict_start, dict_len, last,
                       sai, D):
        (gid_lane, flags_lane, E_j, ls_tab, bwlast, ilist, bwsai,
         eidx) = upto_fill_ej(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        m_ilist = ilist.shape[0]
        e_valid = eidx < it(total)
        KB = int(np.ceil(np.log2(m_ilist + 2)))
        key = (
            (gid_lane.astype(jnp.int64) << (KB + 9))
            | (E_j.astype(jnp.int64) << 9)
            | flags_lane.astype(jnp.int64)
        )
        key_ord = jax.lax.sort(
            jnp.where(e_valid, key, jnp.iinfo(jnp.int64).max))
        fl_ord = (key_ord & 511).astype(it)
        j_ord = ((key_ord >> 9) & jnp.int64((1 << KB) - 1)).astype(it)
        gid_ord = (key_ord >> (KB + 9)).astype(it)
        ls_ord = ls_tab[jnp.clip(gid_ord, 0, nsuf_b - 1)]
        return bwlast, bwsai, fl_ord, j_ord, ls_ord

    fill_slices = [
        ("dict_flat", jax.jit(lambda: chk(upto_dictflat(
            Tp, dict_start, dict_len, D64)))),
        ("+ dict_sort_part", jax.jit(lambda: chk(
            *upto_sort(Tp, dict_start, dict_len, D64)[1][:2]))),
        ("+ word-rank recovery", jax.jit(lambda: chk(upto_ranks(
            Tp, parse_ranks, occs, dict_start, dict_len, D64)[2]
            .astype(jnp.uint64)))),
        ("+ parse-BWT", jax.jit(lambda: chk(*upto_pbwt(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
            D64)[2:5]))),
        ("+ fill lanes (3x diff-scatter+cumsum)", jax.jit(
            lambda: chk(*upto_fill_lanes(
                Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
                D64)[0:3]))),
        ("+ ilist[slot] gather", jax.jit(lambda: chk(
            *upto_fill_ej(Tp, parse_ranks, occs, dict_start, dict_len,
                          last, sai, D64)[0:3]))),
        ("+ final sort + decode", jax.jit(lambda: chk(
            *upto_fill_sort(Tp, parse_ranks, occs, dict_start, dict_len,
                            last, sai, D64)[2:5]))),
    ]

    slices = [
        ("dict_flat", jax.jit(lambda: chk(upto_dictflat(
            Tp, dict_start, dict_len, D64)))),
        ("+ dict_sort_part", jax.jit(lambda: chk(
            *upto_sort(Tp, dict_start, dict_len, D64)[1][:2]))),
        ("+ word-rank recovery", jax.jit(lambda: chk(upto_ranks(
            Tp, parse_ranks, occs, dict_start, dict_len, D64)[2]
            .astype(jnp.uint64)))),
        ("+ parse-BWT", jax.jit(lambda: chk(*upto_pbwt(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
            D64)[2:5]))),
        ("+ kept/gid/fan-out", jax.jit(lambda: chk(*upto_fanout(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
            D64)[10:12]))),
        ("+ row gathers (S[E], ilist[slot])", jax.jit(lambda: chk(
            *upto_rows(Tp, parse_ranks, occs, dict_start, dict_len,
                       last, sai, D64)[3:5]))),
        ("+ final sort + decode", jax.jit(lambda: chk(
            *upto_sortfinal(Tp, parse_ranks, occs, dict_start, dict_len,
                            last, sai, D64)[3:6]))),
    ]
    from pfbwtf_tpu.ops.suffix import fanout_impl

    if fanout_impl() == "fill":
        print("attributing the FILL engine (PFBWT_FANOUT=fill)",
              flush=True)
        slices = fill_slices
    prev = 0.0
    for label, fn in slices:
        dt = t(label, lambda fn=fn: np.asarray(fn()))
        print(f"    increment: {1e3*(dt - prev):9.1f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
