"""Micro-attribution of emission_state at 64 MB shapes.

fill_micro located ~6.7 s of J3 inside emission_state (prep-alone 9.36 s
vs 2.6 s through parse-BWT).  Its candidate hogs: six SEPARATE random
gathers at sa_kept (ls, C1, C2, word_id, prev_sep, prevch), the
occs/seg_start gathers at u, and the ls_tab scatter-MAX.  This times each
standalone and the batched alternatives (one multi-column row gather;
unique .set at group heads; head-compact + gather).

Usage: python benchmarks/emission_micro.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 2


def t(label, fn):
    out = fn()
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

    dict_b = 20971520
    nsuf_b = 18874368
    nph_b = 720896
    it = jnp.int32

    rng = np.random.default_rng(11)
    sa_kept_np = rng.permutation(dict_b)[:nsuf_b].astype(np.int32)
    gid_np = np.cumsum(rng.random(nsuf_b) < 0.9).astype(np.int32)
    ls_np = rng.integers(11, 1732, nsuf_b).astype(np.int32)
    u_np = rng.integers(0, nph_b, nsuf_b).astype(np.int32)

    d_suf_len = jax.device_put(rng.integers(0, 1732, dict_b).astype(np.int32))
    d_c1 = jax.device_put(rng.integers(0, dict_b, dict_b).astype(np.int32))
    d_c2 = jax.device_put(rng.integers(0, dict_b, dict_b).astype(np.int32))
    d_wid = jax.device_put(rng.integers(0, nph_b, dict_b).astype(np.int32))
    d_flat = jax.device_put(rng.integers(0, 6, dict_b).astype(np.uint8))
    sa_kept = jax.device_put(sa_kept_np)
    gid = jax.device_put(gid_np)
    ls = jax.device_put(ls_np)
    u = jax.device_put(u_np)
    occs = jax.device_put(
        rng.integers(1, 200, nph_b).astype(np.int32))
    seg = jax.device_put(
        rng.integers(0, nph_b, nph_b).astype(np.int32))

    def chk(*arrs):
        return sum(jnp.sum(a.astype(jnp.int64)) for a in arrs)

    # ---- the six separate gathers (production emission_state form) ----
    @jax.jit
    def sep_gathers(sa_kept, d_suf_len, d_c1, d_c2, d_wid, d_flat):
        sk = jnp.clip(sa_kept, 0, dict_b - 1)
        prev_sep = jnp.concatenate(
            (jnp.ones(1, jnp.uint8), (d_flat[:-1] <= 1).astype(jnp.uint8)))
        prevch = jnp.concatenate((jnp.zeros(1, jnp.uint8), d_flat[:-1]))
        return chk(d_suf_len[sk], d_c1[sk], d_c2[sk], d_wid[sk],
                   prev_sep[sk].astype(it), prevch[sk].astype(it))

    # ---- one 5-column row gather ----
    @jax.jit
    def row_gather(sa_kept, d_suf_len, d_c1, d_c2, d_wid, d_flat):
        sk = jnp.clip(sa_kept, 0, dict_b - 1)
        prev_sep = jnp.concatenate(
            (jnp.ones(1, jnp.uint8), (d_flat[:-1] <= 1).astype(jnp.uint8)))
        prevch = jnp.concatenate((jnp.zeros(1, jnp.uint8), d_flat[:-1]))
        flags_src = (prev_sep.astype(it) << it(8)) | prevch.astype(it)
        Z = jnp.stack((d_suf_len, d_c1, d_c2, d_wid, flags_src), axis=1)
        R = Z[sk]
        return chk(R[:, 0], R[:, 1], R[:, 2], R[:, 3], R[:, 4])

    # ---- ls_tab variants ----
    @jax.jit
    def lstab_scatter_max(gid, ls):
        tab = jnp.zeros(nsuf_b, it).at[gid].max(
            ls, mode="promise_in_bounds")
        return chk(tab)

    @jax.jit
    def lstab_head_set(gid, ls):
        head = jnp.concatenate(
            (jnp.ones(1, bool), gid[1:] != gid[:-1]))
        tab = jnp.zeros(nsuf_b, it).at[
            jnp.where(head, gid, it(nsuf_b))
        ].set(jnp.where(head, ls, it(0)), unique_indices=True, mode="drop")
        return chk(tab)

    @jax.jit
    def lstab_compact_gather(gid, ls):
        from pfbwtf_tpu.ops.suffix import compact_indices_jax

        head = jnp.concatenate(
            (jnp.ones(1, bool), gid[1:] != gid[:-1]))
        hp = compact_indices_jax(head, nsuf_b, fill=0)
        return chk(ls[hp])

    # ---- occurrence-table gathers at u ----
    @jax.jit
    def u_sep(u, occs, seg):
        return chk(occs[u], seg[u])

    @jax.jit
    def u_row(u, occs, seg):
        Z = jnp.stack((occs, seg), axis=1)
        R = Z[jnp.clip(u, 0, nph_b - 1)]
        return chk(R[:, 0], R[:, 1])

    t("6 separate gathers at sa_kept (production)",
      lambda: np.asarray(sep_gathers(sa_kept, d_suf_len, d_c1, d_c2, d_wid, d_flat)))
    t("one 5-col row gather at sa_kept",
      lambda: np.asarray(row_gather(sa_kept, d_suf_len, d_c1, d_c2, d_wid, d_flat)))
    t("ls_tab scatter-max (production)",
      lambda: np.asarray(lstab_scatter_max(gid, ls)))
    t("ls_tab unique .set at heads",
      lambda: np.asarray(lstab_head_set(gid, ls)))
    t("ls_tab head-compact + gather",
      lambda: np.asarray(lstab_compact_gather(gid, ls)))
    t("occs/seg 2 separate gathers at u (production)",
      lambda: np.asarray(u_sep(u, occs, seg)))
    t("occs/seg one 2-col row gather at u",
      lambda: np.asarray(u_row(u, occs, seg)))


if __name__ == "__main__":
    main()
