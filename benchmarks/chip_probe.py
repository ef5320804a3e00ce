"""On-chip attribution of J2/J3 device time + candidate-op measurements.

The 16 MB breakdown (round 3) showed device COMPUTE dominates the fused
chain (J2 4.4 s, J3 12.2 s; syncs < 0.3 s) — this probe times each
component of those programs as its own jitted call on the real chip, plus
the u32-hash candidates that would replace the emulated-u64 machinery.

Every timed fn returns a small scalar; np.asarray on it forces completion
(block_until_ready does not reliably block through the tunnel).

Usage: [PFBWT_BENCH_MB=16] python benchmarks/chip_probe.py [piece ...]
Pieces: j2 j3 u32 emission (default: all)
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "16"))
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
    print(f"{label:44s} {min(times)*1e3:9.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops import fused
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream
    from pfbwtf_tpu.ops.hash import hash_scan_jax
    from pfbwtf_tpu.ops.suffix import (
        _doubling_jax,
        _HB1,
        _HB2,
        cumsum_u64_jax,
        pow_u64_jax,
        segmented_suffix_hashes_jax,
    )
    from pfbwtf_tpu.constants import EndOfDict, EndOfWord

    pieces = set(sys.argv[1:]) or {"j2", "j3", "u32", "emission"}

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
    tb = int(Tp.shape[0])
    print(f"input {SIZE_MB} MB: n_b={n_b} tb={tb} nph_b={nph_b} "
          f"ncuts={ncuts} D={D} dict_total={dict_total}", flush=True)

    # ---------------- J2 pieces ----------------
    if "j2" in pieces:
        scan_j = jax.jit(lambda c: hash_scan_jax(
            jnp.asarray(c), W, P)[1].sum())
        t("J2: hash scan (cut mask)", lambda: int(np.asarray(
            scan_j(dev_chars))))

        sub_j = jax.jit(lambda Tp, s, l: (
            fused._substring_hashes_dev(Tp, s, l, int(_HB1)).sum()
            + fused._substring_hashes_dev(Tp, s, l, int(_HB2)).sum()))
        t("J2: substring hashes u64 x2 (full Tp)", lambda: int(np.asarray(
            sub_j(Tp, dict_start, dict_len))))

    # ---------------- J3 pieces ----------------
    nsuf = (dict_total - 1 - D) - D * W
    total = C_len + 1
    dict_b = fused._bucket(dict_total)
    nsuf_b = fused._bucket(nsuf)
    total_b = fused._bucket(total)

    # build dict_flat once (device) for the J3 sub-pieces
    def _dict_flat_core(Tp, dict_start, dict_len, D, dict_total):
        it = jnp.int32
        r = jnp.arange(nph_b, dtype=it)
        contrib = jnp.where(r < it(D), dict_len.astype(it) + 1, it(0))
        bounds = jnp.cumsum(contrib)
        pidx = jnp.arange(dict_b, dtype=it)
        word = jnp.clip(jnp.searchsorted(bounds, pidx, side="right"),
                        0, nph_b - 1)
        wstart = bounds[word] - contrib[word]
        within = pidx - wstart
        ch = jnp.where(
            within < dict_len[word],
            Tp[jnp.clip(dict_start[word] + within, 0, tb - 1)],
            jnp.uint8(EndOfWord),
        )
        return jnp.where(pidx < dict_total - 1, ch, jnp.uint8(EndOfDict))

    df_j = jax.jit(_dict_flat_core)
    if "j3" in pieces:
        t("J3: dict_flat build", lambda: int(np.asarray(df_j(
            Tp, dict_start, dict_len, jnp.int64(D),
            jnp.int64(dict_total)).astype(jnp.int32).sum())))
    dict_flat = df_j(Tp, dict_start, dict_len, jnp.int64(D),
                     jnp.int64(dict_total))

    def _sym_of(dict_flat):
        it = jnp.int32
        Dn = dict_flat.shape[0]
        iota = jnp.arange(Dn, dtype=it)
        is_eow = dict_flat == EndOfWord
        word_id = jnp.concatenate(
            (jnp.zeros(1, it), jnp.cumsum(is_eow.astype(it))[:-1]))
        dwords = jnp.sum(is_eow.astype(it))
        sym = dict_flat.astype(it) + (dwords + it(1))
        sym = jnp.where(is_eow, it(1) + word_id, sym)
        # distinct pad symbols — the scheme the pipeline runs (bounds the
        # doubling rounds by real max LCP, not the pad-run length)
        return jnp.where(dict_flat == EndOfDict, iota - it(Dn), sym)

    if "j3" in pieces:
        dbl_j = jax.jit(
            lambda df: _doubling_jax(_sym_of(df), impl="lax")[0][:8].sum())
        t(f"J3: dict doubling sort [lax] (n={dict_b})",
          lambda: int(np.asarray(dbl_j(dict_flat))))

        seg_j = jax.jit(lambda df: (
            segmented_suffix_hashes_jax(
                df, _suf_len(df), int(_HB1)).sum()
            + segmented_suffix_hashes_jax(
                df, _suf_len(df), int(_HB2)).sum()))

        def _suf_len(df):
            it = jnp.int32
            Dn = df.shape[0]
            iota = jnp.arange(Dn, dtype=it)
            is_sep = (df == EndOfWord) | (df == EndOfDict)
            sep_idx = jnp.where(is_sep, iota, it(Dn))
            return jax.lax.cummin(sep_idx, reverse=True) - iota

        t("J3: segmented suffix hashes u64 x2", lambda: int(np.asarray(
            seg_j(dict_flat))))

        from pfbwtf_tpu.ops.parse_bwt import parse_bwt_core
        pb_j = jax.jit(partial(
            lambda pr, l, s, n, impl: parse_bwt_core(
                pr.astype(jnp.int64), l, s, n, impl=impl)[1][:8].sum(),
            impl="lax"))
        t(f"J3: parse-BWT (doubling at nph_b={nph_b})",
          lambda: int(np.asarray(pb_j(
              parse_ranks, last, sai, jnp.int64(ncuts + 1)))))

    # ---------------- REAL pipeline pieces (current code) --------------
    if "real" in pieces:
        from pfbwtf_tpu.ops.bwt_jax import dict_sort_part

        def _dict_flat_real(Tp, dict_start, dict_len, D, dict_total):
            it = jnp.int32
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
                (bounds - contrib, dict_len.astype(it),
                 dict_start.astype(it)), axis=1)
            wrows = W3[word]
            within = pidx - wrows[:, 0]
            ch = jnp.where(
                within < wrows[:, 1],
                Tp[jnp.clip(wrows[:, 2] + within, 0, tb - 1)],
                jnp.uint8(EndOfWord),
            )
            return jnp.where(
                pidx < dict_total - 1, ch, jnp.uint8(EndOfDict))

        dfr_j = jax.jit(_dict_flat_real)
        t("REAL: dict_flat build (scatter+cummax+rowgather)",
          lambda: int(np.asarray(dfr_j(
              Tp, dict_start, dict_len, jnp.int64(D),
              jnp.int64(dict_total)).astype(jnp.int32).sum())))
        dict_flat2 = dfr_j(Tp, dict_start, dict_len, jnp.int64(D),
                           jnp.int64(dict_total))

        ds_j = jax.jit(lambda df: dict_sort_part(df, W, "lax")[0][:8].sum())
        t(f"REAL: dict_sort_part (packed keys + captures, n={dict_b})",
          lambda: int(np.asarray(ds_j(dict_flat2))))

    # ---------------- J2 remainder pieces ----------------
    if "j2b" in pieces:
        from pfbwtf_tpu.constants import Dollar

        def _tp_build(chars_p, C_len):
            tb2 = n_b + W + 1
            tidx = jnp.arange(tb2, dtype=jnp.int64)
            return jnp.where(
                (tidx == 0) | (tidx > C_len), jnp.uint8(Dollar),
                chars_p[jnp.clip(tidx - 1, 0, n_b - 1)],
            ).astype(jnp.int32).sum()

        tp_j = jax.jit(_tp_build)
        t("J2b: Tp build (where+gather)", lambda: int(np.asarray(
            tp_j(dev_chars, jnp.int64(C_len)))))

        def _compact(chars_p, C_len):
            codes = jnp.asarray(NTOA)[chars_p]
            _, cut = hash_scan_jax(codes, W, P)
            sidx = jnp.arange(n_b, dtype=jnp.int64)
            cut = cut & (sidx < C_len)
            cuts = jnp.nonzero(cut, size=nph_b, fill_value=n_b)[0]
            return cuts[:8].sum()

        from pfbwtf_tpu.utils.tables import NTOA_TABLE as NTOA
        cm_j = jax.jit(_compact)
        t("J2b: scan + nonzero compaction", lambda: int(np.asarray(
            cm_j(dev_chars, jnp.int64(C_len)))))

        def _dedup_sort(h1, h2, key_l, inv):
            order = jnp.lexsort((h2, h1, key_l, inv))
            return order[:8].sum()

        rng2 = np.random.default_rng(9)
        h1s = jax.device_put(rng2.integers(
            0, 1 << 63, size=nph_b).astype(np.uint64))
        h2s = jax.device_put(rng2.integers(
            0, 1 << 63, size=nph_b).astype(np.uint64))
        kl = jax.device_put(rng2.integers(
            0, 4000, size=nph_b).astype(np.int64))
        iv = jax.device_put(np.zeros(nph_b, np.int64))
        ds_j = jax.jit(_dedup_sort)
        t(f"J2b: dedup lexsort (nph_b={nph_b})", lambda: int(np.asarray(
            ds_j(h1s, h2s, kl, iv))))

    # ---------------- doubling-round anatomy ----------------
    if "dbl" in pieces:
        # how many rounds does the dict doubling actually run, and what
        # does ONE round cost at dict_b?
        def _rounds(df):
            it = jnp.int32
            sym = _sym_of(df)
            n = sym.shape[0]
            idx = jnp.arange(n, dtype=it)

            def densify1(order, ck):
                cks = ck[order]
                changed = jnp.concatenate(
                    (jnp.zeros(1, it), (cks[1:] != cks[:-1]).astype(it)))
                nr = jnp.cumsum(changed)
                return (jnp.zeros(n, it).at[order].set(
                    nr, unique_indices=True, mode="promise_in_bounds"))

            k0 = sym.astype(jnp.int64)
            rank = densify1(jnp.argsort(k0), k0)

            def cond(c):
                rank, k, cnt = c
                return (jnp.max(rank) < n - 1) & (k < n)

            def body(c):
                rank, k, cnt = c
                key2 = jnp.where(idx + k < n,
                                 rank[jnp.clip(idx + k, 0, n - 1)], it(-1))
                ck = rank.astype(jnp.int64) * jnp.int64(n + 1) + (
                    key2.astype(jnp.int64) + 1)
                order = jnp.argsort(ck)
                return densify1(order, ck), k * 2, cnt + 1

            _, _, cnt = jax.lax.while_loop(
                cond, body, (rank, jnp.int64(1), jnp.int64(0)))
            return cnt

        rounds_j = jax.jit(_rounds)
        nr = int(np.asarray(rounds_j(dict_flat)))
        print(f"J3: dict doubling ROUNDS = {nr}", flush=True)
        print(f"J3: max dict word len = "
              f"{int(np.asarray(jnp.max(dict_len)))}", flush=True)

        it32 = jnp.int32

        def one_round(rank):
            n = rank.shape[0]
            idx = jnp.arange(n, dtype=it32)
            key2 = jnp.where(idx + 64 < n,
                             rank[jnp.clip(idx + 64, 0, n - 1)], it32(-1))
            ck = rank.astype(jnp.int64) * jnp.int64(n + 1) + (
                key2.astype(jnp.int64) + 1)
            order = jnp.argsort(ck)
            cks = ck[order]
            changed = jnp.concatenate(
                (jnp.zeros(1, it32), (cks[1:] != cks[:-1]).astype(it32)))
            nr_ = jnp.cumsum(changed)
            out = (jnp.zeros(n, it32).at[order].set(
                nr_, unique_indices=True, mode="promise_in_bounds"))
            return out[:8].sum()

        r0 = jax.device_put(np.random.default_rng(7).permutation(
            dict_b).astype(np.int32))
        or_j = jax.jit(one_round)
        t(f"one doubling round (sort+densify, n={dict_b})",
          lambda: int(np.asarray(or_j(r0))))

        sort_j = jax.jit(lambda r: jnp.argsort(
            r.astype(jnp.int64) * jnp.int64(dict_b + 1))[:8].sum())
        t(f"argsort alone (n={dict_b})",
          lambda: int(np.asarray(sort_j(r0))))

        cond_j = jax.jit(lambda r: jnp.max(r))
        t(f"cond reduction alone (n={dict_b})",
          lambda: int(np.asarray(cond_j(r0))))

    # ---------------- scatter vs sort-inverse at dict_b ----------------
    if "scat" in pieces:
        it32 = jnp.int32
        rng3 = np.random.default_rng(11)
        perm = jax.device_put(rng3.permutation(dict_b).astype(np.int32))
        vals = jax.device_put(rng3.integers(
            0, dict_b, size=dict_b).astype(np.int32))

        sc_j = jax.jit(lambda o, v: jnp.zeros(dict_b, it32).at[o].set(
            v, unique_indices=True, mode="promise_in_bounds")[:8].sum())
        t(f"scatter set (n={dict_b})",
          lambda: int(np.asarray(sc_j(perm, vals))))

        def _sort_inv(o, v):
            import jax.lax as lax
            _, inv = lax.sort((o, v), num_keys=1)
            return inv[:8].sum()

        si_j = jax.jit(_sort_inv)
        t(f"sort-inverse (n={dict_b})",
          lambda: int(np.asarray(si_j(perm, vals))))

        ga_j = jax.jit(lambda o, v: v.astype(jnp.int64)[o][:8].sum())
        t(f"gather i64 (n={dict_b})",
          lambda: int(np.asarray(ga_j(perm, vals))))

        g32_j = jax.jit(lambda o, v: v[o][:8].sum())
        t(f"gather i32 (n={dict_b})",
          lambda: int(np.asarray(g32_j(perm, vals))))

        def _kv_round(r):
            import jax.lax as lax
            n = r.shape[0]
            key2 = jnp.roll(r, -64).at[-64:].set(0)
            B = jnp.int64(int(np.ceil(np.log2(dict_b + 2))))
            ck = (r.astype(jnp.int64) << B) | (key2.astype(jnp.int64) + 1)
            iota64 = jnp.arange(n, dtype=it32)
            cks, order = lax.sort((ck, iota64), num_keys=1)
            changed = jnp.concatenate(
                (jnp.zeros(1, it32), (cks[1:] != cks[:-1]).astype(it32)))
            nr_ = jnp.cumsum(changed)
            _, rank = lax.sort((order, nr_), num_keys=1)
            return rank[:8].sum()

        kv_j = jax.jit(_kv_round)
        r0b = jax.device_put(np.random.default_rng(7).permutation(
            dict_b).astype(np.int32))
        t(f"one round, kv-sort formulation (n={dict_b})",
          lambda: int(np.asarray(kv_j(r0b))))

    # ---------------- emission machinery (assemble_core shape) ---------
    if "em2" in pieces:
        it32 = jnp.int32
        total_bx = total_b
        nsuf_bx = nsuf_b
        rng4 = np.random.default_rng(13)
        cnts = np.zeros(nsuf_bx, np.int32)
        kk = total_bx // max(nsuf, 1)
        cnts[:nsuf] = kk
        cnts[0] += total_bx - int(cnts.sum())
        dcnt = jax.device_put(cnts)

        def _fanout(counts):
            first = jnp.concatenate(
                (jnp.zeros(1, it32), jnp.cumsum(counts)[:-1]))
            mark = (jnp.zeros(total_bx, it32)
                    .at[jnp.where(counts > 0, first, it32(total_bx))]
                    .set(jnp.arange(nsuf_bx, dtype=it32) + 1,
                         unique_indices=True, mode="drop"))
            E = jnp.clip(jax.lax.cummax(mark) - 1, 0, nsuf_bx - 1)
            within = jnp.arange(total_bx, dtype=it32) - first[E]
            return (E[:8] + within[:8]).sum()

        fo_j = jax.jit(lambda c: _fanout(c))
        t(f"emission fan-out scatter+cummax+gather (n={total_bx})",
          lambda: int(np.asarray(fo_j(dcnt))))

        # candidate: merge-sort fan-out — concat (first[s]*2 | s-marker)
        # with (e*2+1 | slot), ONE i32 kv sort + cummax replaces the
        # nsuf_b-update scatter (TPU scatters ~100 ns/update)
        def _fanout_merge(counts):
            m = nsuf_bx + total_bx
            first = jnp.concatenate(
                (jnp.zeros(1, it32), jnp.cumsum(counts)[:-1]))
            key = jnp.concatenate(
                (first * 2, jnp.arange(total_bx, dtype=it32) * 2 + 1))
            val = jnp.concatenate(
                (jnp.arange(nsuf_bx, dtype=it32) + 1,
                 jnp.zeros(total_bx, it32)))
            key_s, val_s = jax.lax.sort((key, val), num_keys=1)
            run = jax.lax.cummax(val_s)
            # slot lanes in sorted order are already in e order; compact
            from pfbwtf_tpu.ops.suffix import compact_indices_jax
            slot_pos = compact_indices_jax(
                (key_s & 1) == 1, total_bx, fill=0)
            E = jnp.clip(run[slot_pos] - 1, 0, nsuf_bx - 1)
            within = jnp.arange(total_bx, dtype=it32) - first[E]
            return (E[:8] + within[:8]).sum()

        fm_j = jax.jit(_fanout_merge)
        t(f"emission fan-out merge-sort (n={total_bx})",
          lambda: int(np.asarray(fm_j(dcnt))))

        # scatter alone at this shape (nsuf_b updates into total_b lanes)
        sc2_j = jax.jit(lambda c: jnp.zeros(total_bx, it32).at[
            jnp.where(c > 0,
                      jnp.concatenate((jnp.zeros(1, it32),
                                       jnp.cumsum(c)[:-1])),
                      it32(total_bx))].set(
            jnp.arange(nsuf_bx, dtype=it32) + 1,
            unique_indices=True, mode="drop")[:8].sum())
        t(f"scatter alone ({nsuf_bx} updates into {total_bx})",
          lambda: int(np.asarray(sc2_j(dcnt))))

        # cummax alone at total_b
        cm2_j = jax.jit(lambda c: jax.lax.cummax(
            jnp.zeros(total_bx, it32).at[0].set(1) + c[0] * 0)[:8].sum())
        t(f"cummax i32 alone (n={total_bx})",
          lambda: int(np.asarray(cm2_j(dcnt))))

        # 5-col row gather at total_b from an nsuf_b table (the S[E] form)
        Sx = jax.device_put(np.zeros((nsuf_bx, 5), np.int32))
        Ex = jax.device_put(np.random.default_rng(17).integers(
            0, nsuf_bx, size=total_bx).astype(np.int32))
        rg_j = jax.jit(lambda S, E: S[E][:8, :].sum())
        t(f"5-col row gather (n={total_bx} from {nsuf_bx})",
          lambda: int(np.asarray(rg_j(Sx, Ex))))

        # 1-col gather at total_b (the ilist[slot] form)
        il = jax.device_put(np.zeros(nph_b + 1, np.int32))
        g1_j = jax.jit(lambda il, E: il[jnp.clip(E, 0, nph_b)][:8].sum())
        t(f"1-col gather (n={total_bx} from {nph_b + 1})",
          lambda: int(np.asarray(g1_j(il, Ex))))

        # the final 4-operand emission sort at total_b (i64 key + 3 i32)
        rng5 = np.random.default_rng(19)
        k64 = jax.device_put(rng5.integers(
            0, 1 << 45, size=total_bx).astype(np.int64))
        v1 = jax.device_put(rng5.integers(
            0, 1 << 20, size=total_bx).astype(np.int32))
        s4_j = jax.jit(lambda k, a: jax.lax.sort(
            (k, a, a, a), num_keys=1)[1][:8].sum())
        t(f"final sort i64 key + 3 i32 values (n={total_bx})",
          lambda: int(np.asarray(s4_j(k64, v1))))
        s2_j = jax.jit(lambda k, a: jax.lax.sort(
            (k, a, a), num_keys=1)[1][:8].sum())
        t(f"final sort i64 key + 2 i32 values (n={total_bx})",
          lambda: int(np.asarray(s2_j(k64, v1))))

    # ---------------- emission sort shapes ----------------
    if "emission" in pieces:
        rng = np.random.default_rng(3)
        gid_like = np.sort(rng.integers(0, nsuf, size=total_b)).astype(
            np.int64)
        j_like = rng.permutation(total_b).astype(np.int64)
        dg = jax.device_put(gid_like)
        dj = jax.device_put(j_like)

        em_lax = jax.jit(lambda g, j: jnp.argsort(
            g * jnp.int64(total_b + 1) + j)[:8].sum())
        t(f"emission argsort int64 [lax] (n={total_b})",
          lambda: int(np.asarray(em_lax(dg, dj))))

        rep_j = jax.jit(lambda c: jnp.repeat(
            jnp.arange(nsuf_b, dtype=jnp.int32), c,
            total_repeat_length=total_b)[:8].sum())
        counts = np.zeros(nsuf_b, np.int32)
        k = total_b // max(nsuf, 1)
        counts[:nsuf] = k
        counts[0] += total_b - int(counts.sum())
        t(f"emission jnp.repeat (n={total_b})",
          lambda: int(np.asarray(rep_j(jax.device_put(counts)))))

    # ---------------- u32 candidates ----------------
    if "u32" in pieces:
        def pow_u32(base, nexp):
            e = jnp.arange(nexp, dtype=jnp.uint32)
            acc = jnp.ones(nexp, jnp.uint32)
            b = int(base) & 0xFFFFFFFF
            for bit in range(max(int(nexp - 1).bit_length(), 1)):
                m = ((e >> np.uint32(bit)) & np.uint32(1)) != 0
                acc = jnp.where(m, acc * np.uint32(b), acc)
                b = (b * b) & 0xFFFFFFFF
            return acc

        def cumsum_u32(x, reverse=False):
            xi = jax.lax.bitcast_convert_type(x, jnp.int32)
            c = jax.lax.associative_scan(
                jnp.add, xi, reverse=reverse)
            return jax.lax.bitcast_convert_type(c, jnp.uint32)

        pow64_j = jax.jit(lambda: pow_u64_jax(int(_HB1), tb)[-1])
        t("pow_u64 (tb)", lambda: int(np.asarray(pow64_j())))
        pow32_j = jax.jit(lambda: pow_u32(0x9E3779B1, tb)[-1])
        t("pow_u32 (tb)", lambda: int(np.asarray(pow32_j())))

        x64 = jax.device_put(
            np.random.default_rng(5).integers(
                0, 1 << 63, size=tb).astype(np.uint64))
        c64_j = jax.jit(lambda x: cumsum_u64_jax(x, reverse=True)[0])
        t("cumsum_u64 rev (tb)", lambda: int(np.asarray(c64_j(x64))))
        x32 = jax.device_put(
            np.random.default_rng(5).integers(
                0, 1 << 31, size=tb).astype(np.uint32))
        c32_j = jax.jit(lambda x: cumsum_u32(x, reverse=True)[0])
        t("cumsum_u32 rev (tb, assoc-scan i32)",
          lambda: int(np.asarray(c32_j(x32))))

        def sub_hash_u32(Tp, starts, lens, base):
            c = Tp.astype(jnp.uint32)
            powers = pow_u32(base, tb)
            G = jnp.concatenate(
                (cumsum_u32(c * powers, reverse=True),
                 jnp.zeros(1, jnp.uint32)))
            inv_powers = pow_u32(pow(int(base), -1, 1 << 32), tb)
            s = jnp.clip(starts, 0, tb - 1)
            e = jnp.clip(starts + lens, 0, tb)
            return (G[s] - G[e]) * inv_powers[s]

        sub32_j = jax.jit(lambda Tp, s, l: (
            sub_hash_u32(Tp, s, l, 0x9E3779B1).astype(jnp.uint64).sum()
            + sub_hash_u32(Tp, s, l, 0x85EBCA77).astype(jnp.uint64).sum()
            + sub_hash_u32(Tp, s, l, 0xC2B2AE3D).astype(jnp.uint64).sum()))
        t("J2 candidate: substring hashes u32 x3", lambda: int(np.asarray(
            sub32_j(Tp, dict_start, dict_len))))


if __name__ == "__main__":
    main()
