"""Micro-attribution of the fill-engine lane construction at 64 MB shapes.

j3_slice_probe shows the three fill_pc calls (diff-scatter at run heads +
native-i32 cumsum over total_b) cost ~8 s INSIDE the J3 program, yet
chip_probe measured the pieces standalone at ~0.2-0.9 s.  This script
isolates the multiplier: the same lane construction is timed (a) standalone
from random device arrays, (b) chained after the real J3 prep inside one
jit, and (c) same with lax.optimization_barrier between prep and lanes.
Variants: .add vs .set(unique) scatter, 3 separate fill_pc vs one
(total_b, 3) columnar scatter+cumsum.

Usage: [PFBWT_BENCH_MB=64] python benchmarks/fill_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE_MB = int(os.environ.get("PFBWT_BENCH_MB", "64"))
W, P = 10, 100
REPS = 2


def t(label, fn):
    out = fn()  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:58s} {min(times)*1e3:9.1f} ms", flush=True)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    # shapes from the 64 MB bench point
    nsuf_b = 18874368
    total_b = 75497472
    it = jnp.int32

    rng = np.random.default_rng(7)
    # realistic emission state: every valid suffix emits, runs tile the
    # output; counts ~ total_b/nsuf_b
    counts_np = rng.multinomial(
        total_b - nsuf_b, np.full(nsuf_b, 1.0 / nsuf_b)).astype(np.int32) + 1
    first_np = np.concatenate(([0], np.cumsum(counts_np)[:-1])).astype(
        np.int32)
    gid_np = np.cumsum(rng.random(nsuf_b) < 0.9).astype(np.int32)
    flags_np = rng.integers(0, 512, nsuf_b).astype(np.int32)
    base_np = rng.integers(0, total_b, nsuf_b).astype(np.int32)

    emit_d = jax.device_put(counts_np > 0)
    first_d = jax.device_put(first_np)
    gid_d = jax.device_put(gid_np)
    flags_d = jax.device_put(flags_np)
    base_d = jax.device_put(base_np)

    sidx = jnp.arange(nsuf_b, dtype=it)

    def pe_ex_of(emit):
        return jnp.concatenate(
            (jnp.full(1, -1, it),
             jax.lax.cummax(jnp.where(emit, sidx, it(-1)))[:-1]))

    def fill_add(emit, first, v, pe_ex):
        pv = jnp.where(pe_ex >= 0, v[jnp.clip(pe_ex, 0, nsuf_b - 1)], it(0))
        d = jnp.zeros(total_b, it).at[
            jnp.where(emit, first, it(total_b))
        ].add(jnp.where(emit, v - pv, it(0)), mode="drop")
        return jnp.cumsum(d)

    def fill_set(emit, first, v, pe_ex):
        pv = jnp.where(pe_ex >= 0, v[jnp.clip(pe_ex, 0, nsuf_b - 1)], it(0))
        d = jnp.zeros(total_b, it).at[
            jnp.where(emit, first, it(total_b))
        ].set(jnp.where(emit, v - pv, it(0)), unique_indices=True,
              mode="drop")
        return jnp.cumsum(d)

    def chk(*arrs):
        return sum(jnp.sum(a.astype(jnp.int64)) for a in arrs)

    @jax.jit
    def lanes3_add(emit, first, gid, flags, base):
        pe_ex = pe_ex_of(emit)
        return chk(fill_add(emit, first, gid, pe_ex),
                   fill_add(emit, first, flags, pe_ex),
                   fill_add(emit, first, base, pe_ex))

    @jax.jit
    def lanes1_add(emit, first, gid):
        pe_ex = pe_ex_of(emit)
        return chk(fill_add(emit, first, gid, pe_ex))

    @jax.jit
    def lanes3_set(emit, first, gid, flags, base):
        pe_ex = pe_ex_of(emit)
        return chk(fill_set(emit, first, gid, pe_ex),
                   fill_set(emit, first, flags, pe_ex),
                   fill_set(emit, first, base, pe_ex))

    @jax.jit
    def lanes_col(emit, first, gid, flags, base):
        pe_ex = pe_ex_of(emit)
        V = jnp.stack((gid, flags, base), axis=1)
        pv = jnp.where(
            (pe_ex >= 0)[:, None],
            V[jnp.clip(pe_ex, 0, nsuf_b - 1)], it(0))
        d = jnp.zeros((total_b, 3), it).at[
            jnp.where(emit, first, it(total_b))
        ].set(jnp.where(emit[:, None], V - pv, it(0)),
              unique_indices=True, mode="drop")
        return chk(jnp.cumsum(d, axis=0))

    t("standalone: 1x fill_pc (.add)",
      lambda: np.asarray(lanes1_add(emit_d, first_d, gid_d)))
    t("standalone: 3x fill_pc (.add)  [production form]",
      lambda: np.asarray(lanes3_add(emit_d, first_d, gid_d, flags_d,
                                    base_d)))
    t("standalone: 3x fill_pc (.set unique)",
      lambda: np.asarray(lanes3_set(emit_d, first_d, gid_d, flags_d,
                                    base_d)))
    t("standalone: columnar (total_b,3) scatter+cumsum",
      lambda: np.asarray(lanes_col(emit_d, first_d, gid_d, flags_d,
                                   base_d)))

    # ---- in-context: after the real J3 prep, with/without barrier ----
    CACHE = f"/tmp/pfbwtf_tpu_bench_{SIZE_MB}mb"
    fasta = CACHE + ".pan.fa"
    if not os.path.exists(fasta):
        print("no bench input; skipping in-context variants", flush=True)
        return
    from functools import partial

    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.ops import fused
    from pfbwtf_tpu.ops.bwt_jax import emission_state
    from pfbwtf_tpu.ops.parse import ParserParams, build_stream

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
            partial(fused._parse_core, w=W, p=P, nph_b=nph_b))
    state = fused._parse_jits[key2](dev_chars, jnp.int64(C_len))
    meta = np.asarray(state[-1])
    ncuts, D, dict_total = int(meta[0]), int(meta[1]), int(meta[2])
    (Tp, parse_ranks, occs, dict_start, dict_len, last, sai, _) = state
    nphrases = ncuts + 1
    nsuf = (dict_total - 1 - D) - D * W
    dict_b = fused._bucket(dict_total)
    assert fused._bucket(nsuf) == nsuf_b and fused._bucket(C_len + 1) == \
        total_b, "bench shapes drifted; update the constants above"

    def prep(Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D):
        dict_flat, ss, bwlast, ilist, bwsai, seg_prov = fused._j3_prep_core(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
            jnp.int64(nphrases), D, jnp.int64(dict_total),
            W, dict_b)
        (sa_kept, suf_valid, ls, gid, u, counts, first, flags, ls_tab,
         seg_start) = emission_state(
            dict_flat, occs, jnp.int64(nsuf), W, nsuf_b, it, ss, seg_prov)
        return (counts > 0, first, gid, flags,
                seg_start[u] - first, ls_tab)

    def lanes_after(emit, first, gid, flags, basev):
        pe_ex = pe_ex_of(emit)
        return chk(fill_add(emit, first, gid, pe_ex),
                   fill_add(emit, first, flags, pe_ex),
                   fill_add(emit, first, basev, pe_ex))

    @jax.jit
    def ctx_prep_only(Tp, parse_ranks, occs, dict_start, dict_len, last,
                      sai, D):
        out = prep(Tp, parse_ranks, occs, dict_start, dict_len, last,
                   sai, D)
        return chk(*out[:5])

    @jax.jit
    def ctx_fused(Tp, parse_ranks, occs, dict_start, dict_len, last,
                  sai, D):
        emit, first, gid, flags, basev, _ = prep(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        return lanes_after(emit, first, gid, flags, basev)

    @jax.jit
    def ctx_barrier(Tp, parse_ranks, occs, dict_start, dict_len, last,
                    sai, D):
        emit, first, gid, flags, basev, _ = prep(
            Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D)
        emit, first, gid, flags, basev = jax.lax.optimization_barrier(
            (emit, first, gid, flags, basev))
        return lanes_after(emit, first, gid, flags, basev)

    D64 = jnp.int64(D)
    a = t("in-context: J3 prep alone", lambda: np.asarray(ctx_prep_only(
        Tp, parse_ranks, occs, dict_start, dict_len, last, sai, D64)))
    b = t("in-context: prep + 3x fill_pc (production)",
          lambda: np.asarray(ctx_fused(
              Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
              D64)))
    c = t("in-context: prep + barrier + 3x fill_pc",
          lambda: np.asarray(ctx_barrier(
              Tp, parse_ranks, occs, dict_start, dict_len, last, sai,
              D64)))
    print(f"lane increment: fused {1e3*(b-a):.0f} ms, "
          f"barrier {1e3*(c-a):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
