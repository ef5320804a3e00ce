"""Distributed pipeline stages 2-3: mesh-parallel suffix sorts + emission
sort (the reference's sacak_int/gsacak/final-sweep roles, pushed over the
device mesh).

What is distributed (the FLOP centers — gsa/gsacak.c:2499,2504 and the gSA
sweep, pfbwt.hpp:97-194):

* the parse suffix sort (stage 2) — distributed prefix doubling
* the parse-BWT ilist counting sort — distributed stable sample-sort
* the dict generalized suffix sort (stage 3) — distributed doubling over
  the per-word separator symbols
* the final emission sort by (suffix group, ilist position) — one
  distributed sample-sort of packed uint64 keys

Per-element metadata (wrap gathers, suffix-group hashes, emission fan-out)
is O(n) host numpy for now — exact and cheap relative to the sorts; making
it block-resident is the planned follow-up.  Byte parity with the host
path is gated by tests/test_pfbwt_mesh.py on the 8-device CPU mesh.
"""

from typing import Optional

import numpy as np

from ..ops.bwt import BWTResult, _emissions
from ..ops.parse_bwt import ParseBWT, bwt_of_parse
from ..ops.suffix import dict_initial_symbols_np
from .dsort import _round_up, dsort_blocks, distributed_doubling


def _blocks(arr: np.ndarray, n_dev: int, fill) -> np.ndarray:
    n = arr.shape[0]
    W = _round_up(max(-(-n // n_dev), 64), 64)
    out = np.full(n_dev * W, fill, dtype=np.int64)
    out[:n] = arr
    return out.reshape(n_dev, W)


def dist_stable_argsort(keys: np.ndarray, mesh, axis: str = "dp"):
    """Stable argsort of non-negative int64 keys via the distributed
    sample-sort (key ties break by position payload)."""
    n = keys.shape[0]
    n_dev = mesh.devices.size
    kb = _blocks(keys, n_dev, -1).astype(np.uint64)  # -1 -> U64MAX pad
    pb = _blocks(np.arange(n, dtype=np.int64), n_dev, -1)
    _, spos = dsort_blocks(mesh, axis, kb, pb)
    spos = np.asarray(spos).reshape(-1)
    return spos[spos >= 0][:n]


def mesh_parse_bwt(parse_ranks, last, sai, mesh, axis: str = "dp",
                   get_sai: bool = True) -> ParseBWT:
    """Stage 2 with the suffix sort and the ilist counting sort running as
    mesh collectives; wrap-gather permutes identical to bwt_of_parse."""
    pb = bwt_of_parse(
        parse_ranks, last, sai, get_sai=get_sai,
        sa_fn=lambda seq: distributed_doubling(seq, mesh, axis),
    )
    ilist = dist_stable_argsort(pb.bwt_sym.astype(np.int64), mesh, axis)
    return ParseBWT(bwlast=pb.bwlast, ilist=ilist.astype(np.int64),
                    bwsai=pb.bwsai, bwt_sym=pb.bwt_sym)


def mesh_assemble_bwt(
    dict_flat: np.ndarray,
    w: int,
    occs: np.ndarray,
    bwlast: np.ndarray,
    ilist: np.ndarray,
    bwsai: Optional[np.ndarray],
    n: int,
    mesh,
    axis: str = "dp",
    want_sa: bool = False,
    want_rssa: bool = False,
    sa_dtype=np.uint64,
) -> BWTResult:
    """Stage 3 with the dict gSA (distributed doubling) and the final
    emission order (distributed sample-sort) running over the mesh."""
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    sym, word_id, suf_len, _ = dict_initial_symbols_np(dict_flat)
    sa_all = distributed_doubling(sym.astype(np.int64), mesh, axis)
    sa_kept, gid, u, suf_len_kept, E_suffix, E_j = _emissions(
        dict_flat, w, occs, ilist,
        sa_all=sa_all.astype(np.int64),
        word_id=np.asarray(word_id, dtype=np.int64),
        suf_len=np.asarray(suf_len, dtype=np.int64),
    )
    total = E_j.shape[0]
    assert total == n + 1, f"emission count {total} != n+1 ({n + 1})"
    # distributed final order: one packed key per emission
    key = gid[E_suffix].astype(np.int64) * np.int64(total + 1) + E_j.astype(
        np.int64
    )
    order = dist_stable_argsort(key, mesh, axis)
    s_ord = E_suffix[order]
    j_ord = E_j[order]
    pos_ord = sa_kept[s_ord]
    is_word_start = np.concatenate(([True], (dict_flat[:-1] <= 1)))
    whole = is_word_start[pos_ord]
    bwtc = np.where(
        whole,
        np.asarray(bwlast, dtype=np.uint8)[j_ord],
        np.where(
            pos_ord == 1, np.uint8(0), dict_flat[np.maximum(pos_ord - 1, 0)]
        ),
    ).astype(np.uint8)
    nruns = int(np.count_nonzero(np.diff(bwtc.astype(np.int16))) + 1)
    sa_vals = None
    ssa = esa = None
    if want_sa or want_rssa:
        bwsai = np.asarray(bwsai)
        sa_vals = bwsai.astype(np.uint64)[j_ord] - suf_len_kept[
            s_ord
        ].astype(np.uint64)
        sa_vals[0] = np.uint64(n)
        if want_rssa:
            run_start = np.concatenate(([True], bwtc[1:] != bwtc[:-1]))
            rs = np.flatnonzero(run_start)
            re = np.concatenate((rs[1:] - 1, [total - 1]))
            ssa = np.empty(2 * rs.shape[0], dtype=sa_dtype)
            ssa[0::2] = rs.astype(sa_dtype)
            ssa[1::2] = sa_vals[rs].astype(sa_dtype)
            esa = np.empty(2 * re.shape[0], dtype=sa_dtype)
            esa[0::2] = re.astype(sa_dtype)
            esa[1::2] = sa_vals[re].astype(sa_dtype)
    return BWTResult(
        bwt=bwtc, sa=sa_vals if want_sa else None, nruns=nruns,
        ssa=ssa, esa=esa,
    )
