"""Out-of-core final BWT assembly (-m mode, file_wrappers.hpp role).

The reference's -m flag backs every n-scale container with mmap
(file_wrappers.hpp:36-124) and spills the dict gSA/gLCP workspace to
.gsa/.glcp files (pfbwt.hpp:208-209).  The array-native equivalent here:

* dict/bwlast/ilist/bwsai load as read-only np.memmap views (page cache,
  not RAM);
* the gSA (+gLCP when the native kernel runs) spill to <prefix>.gsa /
  <prefix>.glcp with the reference's width conventions;
* the n-scale emission sort never materializes: emissions are generated
  in suffix order, along which the group id is NONDECREASING — so the
  global (group, ilist-pos) sort decomposes into independent sorts of
  group-aligned chunks, streamed with bounded RAM straight into the
  output files.  RAM = O(|dict| + chunk) (one group may exceed the chunk
  target on extremely repetitive inputs; it is processed whole).

Byte-identical outputs to ops/bwt.assemble_bwt (tested), which is itself
reference-parity-proven.
"""

from typing import Optional

import numpy as np

from .bwt import suffix_layout


class _RunState:
    """Streaming run-length bookkeeping across chunks (.ssa/.esa pairs,
    pfbwt-f.cpp:304-319 semantics)."""

    def __init__(self, sa_dtype):
        self.prev_char = -1  # no previous char yet
        self.prev_sa = np.uint64(0)
        self.nruns = 0
        self.sa_dtype = sa_dtype
        self.ssa_parts = []
        self.esa_parts = []

    def feed(self, base: int, bwtc: np.ndarray, sa_vals: np.ndarray):
        m = bwtc.shape[0]
        if m == 0:
            return
        change = np.empty(m, dtype=bool)
        change[0] = int(bwtc[0]) != self.prev_char
        np.not_equal(bwtc[1:], bwtc[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        self.nruns += int(starts.shape[0])
        if sa_vals is not None:
            gpos = base + starts
            ssa = np.empty(2 * starts.shape[0], dtype=self.sa_dtype)
            ssa[0::2] = gpos.astype(self.sa_dtype)
            ssa[1::2] = sa_vals[starts].astype(self.sa_dtype)
            self.ssa_parts.append(ssa)
            # a run START at global pos g>0 closes the previous run at g-1
            closing = gpos[gpos > 0]
            local = closing - base - 1  # index of g-1 inside this chunk
            esa = np.empty(2 * closing.shape[0], dtype=self.sa_dtype)
            esa[0::2] = (closing - 1).astype(self.sa_dtype)
            prev_vals = np.where(
                local >= 0, sa_vals[np.maximum(local, 0)], self.prev_sa
            )
            esa[1::2] = prev_vals.astype(self.sa_dtype)
            self.esa_parts.append(esa)
            self.prev_sa = sa_vals[-1]
        self.prev_char = int(bwtc[-1])

    def finish(self, total: int):
        if self.prev_char < 0:
            return None, None
        tail = np.empty(2, dtype=self.sa_dtype)
        tail[0] = total - 1
        tail[1] = self.prev_sa
        self.esa_parts.append(tail)
        ssa = (
            np.concatenate(self.ssa_parts)
            if self.ssa_parts
            else np.zeros(0, self.sa_dtype)
        )
        esa = (
            np.concatenate(self.esa_parts)
            if self.esa_parts
            else np.zeros(0, self.sa_dtype)
        )
        return ssa, esa


def assemble_bwt_stream(
    dict_flat: np.ndarray,
    w: int,
    occs: np.ndarray,
    bwlast: np.ndarray,
    ilist: np.ndarray,
    bwsai: Optional[np.ndarray],
    n: int,
    bwt_fp,
    sa_fp=None,
    want_rssa: bool = False,
    sa_dtype=np.dtype("<u8"),
    chunk: int = 1 << 22,
    workspace_prefix: Optional[str] = None,
    workspace_dtype=np.dtype("<u8"),
):
    """Streamed stage 3: writes the BWT (and SA values as sa_dtype) to the
    given file objects in bounded-RAM chunks; returns (nruns, ssa, esa).

    ``workspace_prefix`` spills the dict gSA (+gLCP) to
    <prefix>.gsa/.glcp (reference extension registry, utils.h:17-31).
    """
    sa_dtype = np.dtype(sa_dtype)

    def spill(sa_all, lcp):
        if workspace_prefix is None:
            return
        np.asarray(sa_all).astype(workspace_dtype).tofile(
            workspace_prefix + ".gsa"
        )
        if lcp is not None:
            # gLCP is the signed IntType in the reference (gsacak.h:44-58)
            np.asarray(lcp).astype(
                np.dtype("<i4") if workspace_dtype.itemsize == 4
                else np.dtype("<i8")
            ).tofile(workspace_prefix + ".glcp")

    sa_kept, gid, u, suf_len_kept, seg_start, idt = suffix_layout(
        dict_flat, w, occs, workspace=spill,
        small_hint=np.asarray(ilist).shape[0] < 2**31 - 8,
    )
    dict_flat = np.asarray(dict_flat, dtype=np.uint8)
    occs = np.asarray(occs).astype(idt)
    counts = occs[u].astype(np.int64)
    S = sa_kept.shape[0]
    emis_end = np.cumsum(counts)  # per-suffix emission prefix (inclusive)
    total = int(emis_end[-1]) if S else 0
    assert total == n + 1, f"emission count {total} != n+1 ({n + 1})"

    # group-aligned chunk boundaries: a chunk may only end where gid
    # changes (the global sort never crosses group boundaries)
    is_boundary = np.empty(S, dtype=bool)
    is_boundary[0] = True
    np.not_equal(gid[1:], gid[:-1], out=is_boundary[1:])
    boundaries = np.flatnonzero(is_boundary)  # suffix indices

    is_word_start = np.concatenate(([True], (dict_flat[:-1] <= 1)))
    want_sa_vals = sa_fp is not None or want_rssa
    runs = _RunState(sa_dtype)
    base = 0
    s0 = 0
    first_prefix = np.concatenate(([0], emis_end[:-1]))
    while s0 < S:
        target_emis = (first_prefix[s0]) + chunk
        # furthest suffix whose emissions fit, then back off to a boundary
        s_fit = int(np.searchsorted(emis_end, target_emis, side="right"))
        bpos = int(np.searchsorted(boundaries, s_fit, side="right")) - 1
        s1 = int(boundaries[bpos]) if bpos >= 0 else 0
        if s1 <= s0:
            # oversized group: take it whole (next boundary after s0)
            nb = int(np.searchsorted(boundaries, s0, side="right"))
            s1 = int(boundaries[nb]) if nb < boundaries.shape[0] else S
        cnt = counts[s0:s1]
        m = int(cnt.sum())
        E_suffix = np.repeat(np.arange(s0, s1, dtype=idt), cnt)
        first = np.concatenate(
            ([0], np.cumsum(cnt[:-1], dtype=np.int64))
        ).astype(idt)
        within = np.arange(m, dtype=idt) - np.repeat(first, cnt)
        slots = np.repeat(seg_start[u[s0:s1]].astype(np.int64), cnt) + within
        E_j = np.asarray(ilist)[slots].astype(idt)
        order = np.lexsort((E_j, gid[E_suffix]))
        s_ord = E_suffix[order]
        j_ord = E_j[order]
        pos_ord = sa_kept[s_ord]
        whole = is_word_start[pos_ord]
        bwtc = np.where(
            whole,
            np.asarray(bwlast, dtype=np.uint8)[j_ord],
            np.where(
                pos_ord == 1, np.uint8(0),
                dict_flat[np.maximum(pos_ord - 1, 0)],
            ),
        ).astype(np.uint8)
        bwt_fp.write(bwtc.tobytes())
        sa_vals = None
        if want_sa_vals:
            # gather from the (possibly memmap) bwsai BEFORE widening, so
            # only the chunk's values ever materialize in RAM
            sa_vals = np.asarray(bwsai)[j_ord].astype(np.uint64) - (
                suf_len_kept[s_ord].astype(np.uint64)
            )
            if base == 0:
                sa_vals[0] = np.uint64(n)
            if sa_fp is not None:
                sa_fp.write(sa_vals.astype(sa_dtype).tobytes())
        runs.feed(base, bwtc, sa_vals if want_rssa else None)
        base += m
        s0 = s1
    ssa, esa = runs.finish(total) if want_rssa else (None, None)
    return runs.nruns, ssa, esa
