"""Exact distributed dictionary union/rank: a collective string sample-sort.

The reference merges shard dictionaries by folding PfParser::operator+= in
threads (src/merge_pfp.cpp:97-152): every phrase of every shard lands in one
std::map, which both dedups and byte-lex ranks them.  The TPU-native
equivalent is a *distributed string sort* over the device mesh — one
all_to_all on ICI replaces the shared-memory map:

1. Every device holds a slab of phrase occurrences as fixed-width rows of
   big-endian 8-byte chunks (zero-padded past the phrase end).  Valid phrase
   bytes are >= Dollar == 2, so chunk-wise uint64 order == strcmp order; and
   because the PFP dictionary is prefix-free with no 0x00/0x01 bytes inside
   phrases, padded-row equality == phrase equality.
2. Devices agree on n_dev-1 splitters by regular sampling of the primary
   chunk (all_gather + sort of n_dev samples per device), route each row to
   its bucket with searchsorted(side='right') — equal keys always ride to
   the same device, so no phrase group ever straddles a device boundary —
   and exchange rows with a single tiled all_to_all.
3. Each device lex-sorts its received rows (one multi-operand lax.sort),
   marks group heads, and numbers groups globally with an exclusive scan of
   per-device unique counts (all_gather) — yielding the 1-based dictionary
   rank of every occurrence, byte-identical to the host sort
   (ops/parse._dedup_and_rank) and hence to the reference's
   pfparser.hpp:500-517 ranking.

Capacity note: the padded exchange reserves ``cap`` rows per (src, dst)
pair, so the received slab is n_dev * cap rows.  That is the simple exact
scheme; at pod scale the same program drops in `lax.ragged_all_to_all`
(send exactly the bucket counts) or a two-phase count+exchange.  Row width
is the longest phrase (expected ~p+w chars; p bounds the tail).
"""

from functools import partial
from typing import List

import numpy as np

from ..ops.parse import (
    ParserParams,
    ParseResult,
    _pack8,
    _tprime,
    build_stream,
    phrase_bounds_from_cuts,
)
from ..utils.errors import die
from ..ops.suffix import compact_indices_jax as _compact

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _agree_splitters(k0, valid, *, axis: str, n_dev: int, cap: int):
    """n_dev-1 global splitters by regular sampling of the locally sorted
    primary chunks (deterministic in the data, so the count and exchange
    programs agree without communication between them)."""
    import jax
    import jax.numpy as jnp

    nvalid = jnp.sum(valid.astype(jnp.int64))
    sortk = jnp.sort(k0)
    pos = (jnp.arange(1, n_dev + 1, dtype=jnp.int64) * nvalid) // (n_dev + 1)
    samples = sortk[jnp.clip(pos, 0, cap - 1)]
    all_sorted = jnp.sort(jax.lax.all_gather(samples, axis).reshape(-1))
    sp_pos = (jnp.arange(1, n_dev, dtype=jnp.int64) * (n_dev * n_dev)) // n_dev
    return all_sorted[sp_pos]


def _bucket_of(cols, idx, *, axis: str, n_dev: int, cap: int):
    import jax.numpy as jnp

    valid = idx >= 0
    k0 = jnp.where(valid, cols[:, 0], _U64MAX)
    splitters = _agree_splitters(k0, valid, axis=axis, n_dev=n_dev, cap=cap)
    # equal keys -> same bucket (side='right'), so groups never straddle
    return jnp.searchsorted(splitters, k0, side="right"), valid


def _count_step(cols_blk, idx_blk, *, axis: str, n_dev: int, cap: int):
    """Phase 1 of the two-phase exchange: per-(src,dst) bucket counts."""
    import jax.numpy as jnp

    bucket, valid = _bucket_of(
        cols_blk[0], idx_blk[0], axis=axis, n_dev=n_dev, cap=cap
    )
    counts = jnp.zeros(n_dev, jnp.int64).at[bucket].add(
        valid.astype(jnp.int64), mode="drop"
    )
    return counts[None]


def _dict_rank_step(cols_blk, idx_blk, *, axis: str, n_dev: int, cap: int,
                    pair_cap: int, ncols: int):
    """Phase 2: route rows with a tight per-pair capacity (from phase 1's
    counts), local byte-lex sort, global dense 1-based group ranks.

    cols_blk: (1, cap, ncols) uint64 big-endian chunk rows (U64MAX padding).
    idx_blk:  (1, cap) int64 global occurrence index (-1 padding).
    Returns (occ index, rank) over the received n_dev*pair_cap slab.
    """
    import jax
    import jax.numpy as jnp

    cols = cols_blk[0]
    idx = idx_blk[0]
    bucket, valid = _bucket_of(cols, idx, axis=axis, n_dev=n_dev, cap=cap)

    send_cols: List = []
    send_idx: List = []
    for d in range(n_dev):
        sel = _compact((bucket == d) & valid, pair_cap, fill=cap)
        send_cols.append(
            jnp.take(cols, sel, axis=0, mode="fill", fill_value=_U64MAX)
        )
        send_idx.append(jnp.take(idx, sel, mode="fill", fill_value=-1))
    sc = jnp.stack(send_cols)  # (n_dev, pair_cap, ncols)
    si = jnp.stack(send_idx)  # (n_dev, pair_cap)

    rcols = jax.lax.all_to_all(sc, axis, 0, 0, tiled=True).reshape(
        n_dev * pair_cap, ncols
    )
    ridx = jax.lax.all_to_all(si, axis, 0, 0, tiled=True).reshape(
        n_dev * pair_cap
    )

    # local byte-lex sort (padding rows are all-U64MAX and sort last: valid
    # rows start with a byte <= 'Z' < 0xFF)
    order = jnp.lexsort(tuple(rcols[:, j] for j in range(ncols - 1, -1, -1)))
    scols = rcols[order]
    sidx = ridx[order]
    svalid = sidx >= 0
    diff = jnp.any(scols[1:] != scols[:-1], axis=1)
    head = jnp.concatenate((jnp.ones(1, bool), diff)) & svalid
    gid = jnp.cumsum(head.astype(jnp.int64)) - 1

    # global dense 1-based ranks: exclusive scan of per-device unique counts
    local_unique = jnp.sum(head.astype(jnp.int64))
    counts = jax.lax.all_gather(local_unique, axis)
    my = jax.lax.axis_index(axis)
    base = jnp.sum(jnp.where(jnp.arange(n_dev) < my, counts, 0))
    rank = jnp.where(svalid, base + gid + 1, 0)
    return sidx[None], rank[None]


def _count_program(mesh, axis: str, n_dev: int, cap: int, ncols: int):
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.jit(
        jax.shard_map(
            partial(_count_step, axis=axis, n_dev=n_dev, cap=cap),
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None)),
            out_specs=P(axis, None),
        )
    )


def _rank_program(mesh, axis: str, n_dev: int, cap: int, pair_cap: int,
                  ncols: int):
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.jit(
        jax.shard_map(
            partial(_dict_rank_step, axis=axis, n_dev=n_dev, cap=cap,
                    pair_cap=pair_cap, ncols=ncols),
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None)),
        )
    )


def _round_up(n: int, step: int) -> int:
    return -(-n // step) * step


def rank_rows_blocks(blk_cols, blk_idx, N: int, mesh, axis: str = "dp"):
    """Two-phase collective rank over pre-blocked rows (device arrays OK:
    the blocks may already live in HBM from the row-builder program).

    Phase 1 counts each (src, dst) bucket; the host sizes the exchange with
    pair_cap = max count — O(N) aggregate buffer instead of the padded
    all_to_all's O(n_dev * N) (ROADMAP round-1 item 3).
    """
    n_dev, cap, ncols = blk_cols.shape
    counts = np.asarray(
        _count_program(mesh, axis, n_dev, cap, ncols)(blk_cols, blk_idx)
    )
    pair_cap = max(64, _round_up(int(counts.max(initial=0)), 64))
    fn = _rank_program(mesh, axis, n_dev, cap, pair_cap, ncols)
    out_idx, out_rank = fn(blk_cols, blk_idx)
    out_idx = np.asarray(out_idx).reshape(-1)
    out_rank = np.asarray(out_rank).reshape(-1)
    keep = out_idx >= 0
    ranks = np.zeros(N, dtype=np.int64)
    ranks[out_idx[keep]] = out_rank[keep]
    if N and ranks.min() < 1:
        die("distributed rank: unassigned occurrence (collective bug)")
    return ranks, int(ranks.max(initial=0))


def distributed_rank_rows(cols: np.ndarray, mesh, axis: str = "dp"):
    """Dense 1-based lexicographic group ranks of uint64 chunk rows,
    computed with mesh collectives.  Returns (ranks (N,), n_unique)."""
    cols = np.ascontiguousarray(cols, dtype=np.uint64)
    N, ncols = cols.shape
    n_dev = mesh.devices.size
    cap = _round_up(max(1, -(-N // n_dev)), 256)
    blk_cols = np.full((n_dev, cap, ncols), _U64MAX, dtype=np.uint64)
    blk_idx = np.full((n_dev, cap), -1, dtype=np.int64)
    flat_cols = blk_cols.reshape(n_dev * cap, ncols)
    flat_idx = blk_idx.reshape(n_dev * cap)
    flat_cols[:N] = cols
    flat_idx[:N] = np.arange(N, dtype=np.int64)
    return rank_rows_blocks(blk_cols, blk_idx, N, mesh, axis)


def phrase_chunk_rows(T: np.ndarray, starts, ends) -> np.ndarray:
    """(N, ncols) big-endian 8-byte chunk rows of T[s..e] per phrase."""
    starts = np.asarray(starts, dtype=np.int64)
    lens = (np.asarray(ends, dtype=np.int64) - starts + 1)
    ncols = max(1, -(-int(lens.max(initial=1)) // 8))
    cols = np.empty((starts.shape[0], ncols), dtype=np.uint64)
    for j in range(ncols):
        cols[:, j] = _pack8(T, starts, 8 * j, lens)
    return cols


def _dict_from_ranks(T: np.ndarray, starts, ends, ranks: np.ndarray):
    """Host tail shared by the distributed and local device paths: flat
    (start, len) dict view + occurrence counts from 1-based ranks."""
    D = int(ranks.max(initial=0))
    occs = np.bincount(ranks, minlength=D + 1)[1:].astype(np.uint64)
    _, first = np.unique(ranks, return_index=True)
    lens = (ends - starts + 1).astype(np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    return starts[first], lens[first], occs, ranks.astype(np.uint32)


def distributed_dedup_rank(T: np.ndarray, starts, ends, mesh,
                           axis: str = "dp"):
    """Collective phrase dedup + byte-lex ranking.

    Returns (dict_starts, dict_lens, occs, parse_ranks) with identical
    semantics to ops.parse._dedup_and_rank (pfparser.hpp:484-517).
    """
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    cols = phrase_chunk_rows(T, starts, ends)
    ranks, _ = distributed_rank_rows(cols, mesh, axis)
    return _dict_from_ranks(T, starts, ends, ranks)


_local_rank_jit = None


def device_rank_rows(cols: np.ndarray) -> np.ndarray:
    """Single-device byte-lex group ranks of chunk rows: one multi-operand
    lax.sort + adjacent-compare in HBM (the no-mesh form of the collective
    rank; shapes are bucketed so compiled programs are reused)."""
    global _local_rank_jit
    import jax
    import jax.numpy as jnp

    if _local_rank_jit is None:

        @jax.jit
        def rank_rows(c):
            order = jnp.lexsort(
                tuple(c[:, j] for j in range(c.shape[1] - 1, -1, -1))
            )
            s = c[order]
            head = jnp.concatenate(
                (jnp.ones(1, bool), jnp.any(s[1:] != s[:-1], axis=1))
            )
            gid = jnp.cumsum(head.astype(jnp.int64))  # 1-based
            return jnp.zeros(c.shape[0], jnp.int64).at[order].set(gid)

        _local_rank_jit = rank_rows

    N, ncols = cols.shape
    ncols_b = -(-max(ncols, 1) // 4) * 4
    Nb = _round_up(max(N, 1), 4096)
    padded = np.zeros((Nb, ncols_b), dtype=np.uint64)
    padded[:N, :ncols] = cols
    padded[N:, :] = _U64MAX  # padding rows sort last (real bytes < 0xFF)
    return np.asarray(_local_rank_jit(padded))[:N]


_text_rank_jit = None


def dedup_rank_device(T: np.ndarray, starts, ends):
    """On-device phrase dedup+rank: ONE jit gathers the 8-byte chunk rows
    straight out of the text in HBM, lex-sorts them, and emits dense
    1-based ranks — no host-side row materialization (the device-resident
    pipeline path).  Shapes are bucketed for compile reuse."""
    global _text_rank_jit
    import jax
    import jax.numpy as jnp
    from functools import partial

    if _text_rank_jit is None:

        @partial(jax.jit, static_argnames=("ncols",))
        def text_rank(Tp, starts_p, lens_p, valid, ncols):
            Nb = starts_p.shape[0]
            tmax = Tp.shape[0] - 1
            cols = []
            for j in range(ncols):
                val = jnp.zeros(Nb, dtype=jnp.uint64)
                for b in range(8):
                    off = 8 * j + b
                    idx = jnp.minimum(starts_p + off, tmax)
                    ch = Tp[idx].astype(jnp.uint64)
                    ok = off < lens_p
                    val = (val << jnp.uint64(8)) | jnp.where(ok, ch, 0)
                cols.append(jnp.where(valid, val, _U64MAX))
            c = jnp.stack(cols, axis=1)
            order = jnp.lexsort(
                tuple(c[:, j] for j in range(ncols - 1, -1, -1))
            )
            s = c[order]
            head = jnp.concatenate(
                (jnp.ones(1, bool), jnp.any(s[1:] != s[:-1], axis=1))
            )
            gid = jnp.cumsum(head.astype(jnp.int64))  # 1-based
            return jnp.zeros(Nb, jnp.int64).at[order].set(gid)

        _text_rank_jit = text_rank

    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts + 1
    N = starts.shape[0]
    ncols = max(1, -(-int(lens.max(initial=1)) // 8))
    ncols_b = -(-ncols // 4) * 4
    Nb = _round_up(max(N, 1), 4096)
    Tb_len = _round_up(T.shape[0] + 1, 1 << 16)
    Tp = np.zeros(Tb_len, dtype=np.uint8)
    Tp[: T.shape[0]] = T
    starts_p = np.zeros(Nb, dtype=np.int64)
    starts_p[:N] = starts
    lens_p = np.zeros(Nb, dtype=np.int64)
    lens_p[:N] = lens
    valid = np.zeros(Nb, dtype=bool)
    valid[:N] = True
    ranks = np.asarray(
        _text_rank_jit(Tp, starts_p, lens_p, valid, ncols_b)
    )[:N]
    return _dict_from_ranks(T, starts, ends, ranks)


# --------------------------------------------------------------------------
# Device-resident collective parse: the cut compaction and the phrase-row
# gathers run INSIDE shard_map programs over the sharded T' — no
# host-materialized cut mask, no host-built phrase rows (round-1 VERDICT
# items 4/5).  The cut scan operates directly on T'-sharded chars: T'
# window position t corresponds to stream position k = t-1, so the cut set
# is {t : t>w, hash(kmer at t)%p==0, t<=C_len} plus the pseudo-cut at
# t = C_len + w for the final phrase, making phrase bookkeeping uniform.
# --------------------------------------------------------------------------


def _cut_mask_t(ext, blk_start, *, w: int, p: int, H: int, W_t: int,
                C_len):
    """Cut mask over one T' block with an H-byte left halo attached."""
    import jax.numpy as jnp

    from ..ops.hash import mod_p_u64_via_u32, wang_hash_jax, window_kmers_jax
    from ..utils.tables import ntoa_codes_jax

    codes = ntoa_codes_jax(ext)
    km = window_kmers_jax(codes, w)[H:]
    h = wang_hash_jax(km)
    t = blk_start + jnp.arange(W_t, dtype=jnp.int64)
    if p < (1 << 15):
        hit = mod_p_u64_via_u32(h, p) == 0
    else:
        hit = (h % jnp.uint64(p)) == 0
    cut = hit & (t > w) & (t <= C_len)
    return cut | (t == C_len + w), t


def _halo_ext(tp, *, axis: str, n_dev: int, H: int):
    import jax
    import jax.numpy as jnp

    tail = tp[-H:]
    prev = jax.lax.ppermute(
        tail, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    return jnp.concatenate((prev, tp))


def _mesh_sizing_step(tp_blk, C_len, *, axis: str, n_dev: int, W_t: int,
                      H: int, w: int, p: int):
    """Per-shard phrase statistics: (count, first_t, last_t,
    max_len_excluding_first_cut).  Host combines across shards."""
    import jax
    import jax.numpy as jnp

    tp = tp_blk[0]
    my = jax.lax.axis_index(axis)
    blk_start = my.astype(jnp.int64) * W_t
    ext = _halo_ext(tp, axis=axis, n_dev=n_dev, H=H)
    cut, t = _cut_mask_t(ext, blk_start, w=w, p=p, H=H, W_t=W_t,
                         C_len=C_len)
    marked = jnp.where(cut, t, jnp.int64(-1))
    count = jnp.sum(cut.astype(jnp.int64))
    first_t = jnp.min(jnp.where(cut, t, jnp.int64(np.iinfo(np.int64).max)))
    last_t = jnp.max(marked)
    pc = jnp.concatenate(
        (jnp.full(1, -1, jnp.int64), jax.lax.cummax(marked)[:-1])
    )
    has_prev = cut & (pc >= 0)
    maxlen_rest = jnp.max(jnp.where(has_prev, t - pc + w, 0))
    return (count[None], first_t[None], last_t[None], maxlen_rest[None])


def _mesh_rows_step(tp_blk, prev_t_in, base_idx, C_len,
                    *, axis: str, n_dev: int, W_t: int, H: int,
                    local_cap: int, ncols: int, w: int, p: int):
    """Per-shard phrase extraction: local cut compaction + row gathers from
    the halo-extended block.  Everything stays on device; the returned
    blocks feed the two-phase collective rank directly."""
    import jax
    import jax.numpy as jnp

    tp = tp_blk[0]
    my = jax.lax.axis_index(axis)
    blk_start = my.astype(jnp.int64) * W_t
    ext = _halo_ext(tp, axis=axis, n_dev=n_dev, H=H)
    cut, _ = _cut_mask_t(ext, blk_start, w=w, p=p, H=H, W_t=W_t,
                         C_len=C_len)
    nloc = jnp.sum(cut.astype(jnp.int64))
    loc = _compact(cut, local_cap, fill=0).astype(jnp.int64)
    j = jnp.arange(local_cap, dtype=jnp.int64)
    valid = j < nloc
    ends = blk_start + loc  # T' coords (e = t)
    prev_e = jnp.concatenate((prev_t_in.reshape(1), ends[:-1]))
    starts = prev_e - w + 1
    lens = jnp.where(valid, ends - starts + 1, 0)

    # big-endian 8-byte chunk rows gathered from ext (left halo covers the
    # longest phrase); invalid slots are U64MAX so they sort last
    emax = H + W_t - 1
    rel = starts - (blk_start - H)  # start offset inside ext
    cols = []
    for c in range(ncols):
        val = jnp.zeros(local_cap, dtype=jnp.uint64)
        for b in range(8):
            off = 8 * c + b
            idx_b = jnp.clip(rel + off, 0, emax)
            ch = ext[idx_b].astype(jnp.uint64)
            ok = off < lens
            val = (val << jnp.uint64(8)) | jnp.where(ok, ch, jnp.uint64(0))
        cols.append(jnp.where(valid, val, _U64MAX))
    rows = jnp.stack(cols, axis=1)  # (local_cap, ncols)
    occ_idx = jnp.where(valid, base_idx.reshape(()) + j, jnp.int64(-1))
    last = jnp.where(
        valid, ext[jnp.clip(ends - w - (blk_start - H), 0, emax)],
        jnp.uint8(0),
    )
    return (
        rows[None],
        occ_idx[None],
        jnp.where(valid, starts, 0)[None],
        jnp.where(valid, ends, 0)[None],
        last[None],
    )


def _mesh_parse_programs(mesh, axis, n_dev, W_t, H, w, p, local_cap, ncols):
    import jax
    from jax.sharding import PartitionSpec as P

    sizing = jax.jit(
        jax.shard_map(
            partial(_mesh_sizing_step, axis=axis, n_dev=n_dev, W_t=W_t,
                    H=H, w=w, p=p),
            mesh=mesh,
            in_specs=(P(axis, None), P()),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
        )
    )
    rows = None
    if local_cap is not None:
        rows = jax.jit(
            jax.shard_map(
                partial(_mesh_rows_step, axis=axis, n_dev=n_dev, W_t=W_t,
                        H=H, local_cap=local_cap, ncols=ncols, w=w, p=p),
                mesh=mesh,
                in_specs=(P(axis, None), P(axis), P(axis), P()),
                out_specs=(P(axis, None), P(axis, None), P(axis, None),
                           P(axis, None), P(axis, None)),
            )
        )
    return sizing, rows


def distributed_parse_records(records, params: ParserParams, mesh,
                              axis: str = "dp") -> ParseResult:
    """Full collective parse: sharded halo-exchange hash scan, ON-DEVICE cut
    compaction + phrase-row gathers, and the two-phase distributed
    sample-sort for the dictionary — the multi-chip equivalent of
    PfParser::add_fasta + finalize (pfparser.hpp:299-369, 484-517), exact
    by the junction identity.  Host traffic is O(#phrases) metadata plus
    two scalar rounds; the text-sized cut mask never leaves the devices."""
    import jax

    from ..utils.limits import check_phrase_count
    from ..utils.tables import NTOA_TABLE

    w, p = params.w, params.p
    C, doc_names, doc_starts = build_stream(records, params)
    codes_chk = NTOA_TABLE[C]
    if codes_chk.size and codes_chk.max() > 3:
        bad = C[codes_chk > 3][0]
        die(f"invalid character {bad}/{chr(bad)} in input "
            "(use --non-acgt-to-a)")
    del codes_chk
    T = _tprime(C, w)
    C_len = int(C.shape[0])
    n_dev = mesh.devices.size

    W_t = _round_up(max(-(-T.shape[0] // n_dev), 64), 64)
    tp_pad = np.full(n_dev * W_t, 0, dtype=np.uint8)  # pad byte 0 < Dollar
    tp_pad[: T.shape[0]] = T
    tp_blocks = tp_pad.reshape(n_dev, W_t)
    H0 = _round_up(w + 1, 64)

    sizing, _ = _mesh_parse_programs(
        mesh, axis, n_dev, W_t, H0, w, p, None, None
    )
    cnt, first_t, last_t, maxlen_rest = (
        np.asarray(x) for x in sizing(tp_blocks, np.int64(C_len))
    )
    nphrases = int(cnt.sum())
    if nphrases <= 1:
        die("error: only one dict word total. Re-run with a smaller p "
            "modulus")
    check_phrase_count(nphrases)

    # cross-shard stitching on n_dev scalars: previous cut per shard +
    # corrected first-cut phrase lengths
    prev_t = np.full(n_dev, w - 1, dtype=np.int64)  # w-1 => start 0
    run_last = np.int64(w - 1)
    have_prev = False
    maxlen = int(maxlen_rest.max(initial=0))
    for s in range(n_dev):
        prev_t[s] = run_last
        if cnt[s] > 0:
            f = int(first_t[s])
            maxlen = max(
                maxlen, f - int(run_last) + w if have_prev else f + 1
            )
            run_last = last_t[s]
            have_prev = True
    base_idx = np.zeros(n_dev, dtype=np.int64)
    np.cumsum(cnt[:-1], out=base_idx[1:])

    H = _round_up(max(maxlen, w + 1), 64)
    if H > W_t:
        # a phrase longer than a shard: single-neighbor halo insufficient —
        # exact host fallback (rare: p bounds expected phrase length)
        cut_np = np.zeros(0, np.int64)
        from ..ops.hash import hash_scan_np

        _, _, cutm = hash_scan_np(C, w, p)
        cut_np = np.flatnonzero(cutm)
        starts, ends = phrase_bounds_from_cuts(C_len, cut_np, w)
        dict_starts, dict_lens, occs, parse_ranks = distributed_dedup_rank(
            T, starts, ends, mesh, axis
        )
    else:
        local_cap = _round_up(max(int(cnt.max(initial=1)), 64), 64)
        ncols = max(1, -(-maxlen // 8))
        _, rows_prog = _mesh_parse_programs(
            mesh, axis, n_dev, W_t, H, w, p, local_cap, ncols
        )
        rows_d, idx_d, starts_d, ends_d, last_d = rows_prog(
            tp_blocks, prev_t, base_idx, np.int64(C_len)
        )
        ranks, _ = rank_rows_blocks(rows_d, idx_d, nphrases, mesh, axis)
        # O(#phrases) metadata to host, compacted to occurrence order
        idx_h = np.asarray(idx_d).reshape(-1)
        keep = idx_h >= 0
        order = idx_h[keep]
        starts = np.empty(nphrases, dtype=np.int64)
        ends = np.empty(nphrases, dtype=np.int64)
        starts[order] = np.asarray(starts_d).reshape(-1)[keep]
        ends[order] = np.asarray(ends_d).reshape(-1)[keep]
        dict_starts, dict_lens, occs, parse_ranks = _dict_from_ranks(
            T, starts, ends, ranks
        )
    last = T[ends - w]
    sai = ends.astype(np.uint64)
    return ParseResult(
        params=params,
        text=T,
        dict_starts=dict_starts,
        dict_lens=dict_lens,
        occs=occs,
        parse_ranks=parse_ranks,
        last=last,
        sai=sai,
        doc_names=list(doc_names) if params.store_docs else [],
        doc_starts=list(doc_starts) if params.store_docs else [],
        pos=C.shape[0] + w,
        nseqs=len(records),
    )
