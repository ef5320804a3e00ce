"""Chunked (bounded-memory) parse scan.

The reference's answer to workspace > RAM is mmap-backed containers
(file_wrappers.hpp:36-124, -m flag).  The TPU-native analogue bounds HBM:
the char stream is pushed through the device hash scan in fixed-size chunks
with a (w-1)-code halo carried between chunks — the same junction identity
the sharded path uses, so chunking is exact for any chunk size.

Each chunk is one compiled program (one shape -> one compile, reused), and
chunks can be double-buffered against H2D transfers.  The collected cut
positions feed the ordinary finalize.
"""

from functools import partial
from typing import Iterable, List

import numpy as np

from ..utils.errors import die
from ..utils.tables import NTOA_TABLE


def chunked_cut_positions(
    codes_iter: Iterable[np.ndarray], w: int, p: int, chunk: int = 1 << 24,
    depth: int = 2,
) -> np.ndarray:
    """Global cut positions over a stream of code arrays (values 0..3).

    ``codes_iter`` yields arbitrary-size pieces; they are re-blocked into
    fixed ``chunk``-size device calls.  Dispatch is pipelined ``depth``
    deep: chunk k+1's H2D transfer and scan overlap the host-side
    materialization of chunk k's results (JAX dispatch is async; only the
    ``np.asarray`` fetch blocks).  Returns absolute cut positions.
    """
    import jax
    import jax.numpy as jnp

    halo = max(w - 1, 0)

    @partial(jax.jit, static_argnames=("w", "p", "size"))
    def scan_chunk(ext_codes, offset, w, p, size):
        # ext_codes: (halo + chunk,) — positions halo..halo+chunk-1 are live
        from .hash import mod_p_u64_via_u32, wang_hash_jax, window_kmers_jax

        km = window_kmers_jax(ext_codes, w)[halo:]
        h = wang_hash_jax(km)
        gpos = offset + jnp.arange(chunk, dtype=jnp.int64)
        if p < (1 << 15):
            hit = mod_p_u64_via_u32(h, p) == 0
        else:
            hit = (h % jnp.uint64(p)) == 0
        cut = hit & (gpos >= w)
        count = jnp.sum(cut.astype(jnp.int64))
        from .suffix import compact_indices_jax

        pos = compact_indices_jax(cut, size, fill=-1).astype(jnp.int64)
        return count, pos

    buf = np.zeros(halo + chunk, dtype=np.uint8)
    fill = 0  # valid codes currently in buf[halo:]
    offset = 0  # absolute position of buf[halo]
    cuts: List[np.ndarray] = []
    # conservative per-chunk cut capacity; p>=2 so cuts <= chunk/1, use
    # chunk//max(p,1)*8+1024 bucketed to limit recompiles
    size = min(chunk, (chunk // max(p, 1)) * 8 + 1024)
    pending: List[tuple] = []  # (count_dev, pos_dev, ext_copy, off, n_valid)

    def collect():
        count_dev, pos_dev, ext_copy, off, n_valid = pending.pop(0)
        count = int(np.asarray(count_dev))
        if count > size:
            # rare dense-cut chunk: redo synchronously at full capacity
            count2, pos_dev = scan_chunk(ext_copy, off, w, p, chunk)
            count = int(np.asarray(count2))
        pos_np = np.asarray(pos_dev)[:count]
        pos_np = pos_np[pos_np < n_valid]
        cuts.append(pos_np + off)

    def flush(n_valid):
        nonlocal offset
        if n_valid == 0:
            return
        # the H2D copy of `buf` happens at call time, so the buffer can be
        # refilled immediately; keep a host copy only for the rare
        # capacity-overflow rescan
        ext_copy = buf.copy()
        count_dev, pos_dev = scan_chunk(ext_copy, offset, w, p, size)
        pending.append((count_dev, pos_dev, ext_copy, offset, n_valid))
        if len(pending) >= max(depth, 1):
            collect()
        # carry halo: last halo codes of the valid region
        if halo:
            lo = halo + n_valid - halo
            buf[:halo] = buf[lo : halo + n_valid]
        offset += n_valid

    for piece in codes_iter:
        piece = np.asarray(piece, dtype=np.uint8)
        i = 0
        while i < piece.shape[0]:
            take = min(chunk - fill, piece.shape[0] - i)
            buf[halo + fill : halo + fill + take] = piece[i : i + take]
            fill += take
            i += take
            if fill == chunk:
                flush(chunk)
                fill = 0
    if fill:
        buf[halo + fill :] = 0
        flush(fill)
    while pending:
        collect()
    if not cuts:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(cuts)


def parse_fasta_chunked(fname: str, params, chunk: int = 1 << 24,
                        workdir=None):
    """Bounded-memory parse (the -m mmap-mode analogue, end to end):

    * FASTA records stream one at a time (io/fasta.iter_fasta_records);
      only the current record is resident.
    * T' = Dollar + C + Dollar*w is written to a scratch file as the
      stream passes and re-opened as a read-only memmap — the dict
      dedup/rank reads phrase bytes through page faults, never holding
      the text in RAM.
    * the cut scan runs on device in fixed ``chunk``-size pieces with a
      carried halo (double-buffered dispatch).

    Identical output to engine.parse_fasta for any chunk size.
    """
    import os as _os
    import tempfile

    from ..constants import Dollar
    from ..utils.tables import NT4_TABLE, UPPER_TABLE
    from .parse import ParseResult, _dedup_and_rank, phrase_bounds_from_cuts

    w = params.w
    fd, tpath = tempfile.mkstemp(suffix=".tprime", dir=workdir)
    tf = _os.fdopen(fd, "wb")
    doc_names: List[str] = []
    doc_starts: List[int] = []
    state = {"nseqs": 0, "clen": 0}
    padA = np.full(w, ord("A"), dtype=np.uint8)

    def code_pieces():
        tf.write(bytes([Dollar]))
        from ..io.fasta import iter_fasta_records

        for name, seq in iter_fasta_records(fname):
            seq = UPPER_TABLE[seq]
            if params.non_acgt_to_a:
                seq = np.where(NT4_TABLE[seq] > 3, np.uint8(ord("A")), seq)
            doc_names.append(name)
            doc_starts.append(state["clen"])
            state["nseqs"] += 1
            state["clen"] += seq.shape[0] + w
            tf.write(seq.tobytes())
            tf.write(padA.tobytes())
            codes = NTOA_TABLE[seq]
            if codes.size and codes.max() > 3:
                bad = seq[codes > 3][0]
                die(f"invalid character {bad}/{chr(bad)} in input "
                    "(use --non-acgt-to-a)")
            yield codes
            yield np.zeros(w, dtype=np.uint8)  # the 'A' pad hashes as 0s
        tf.write(bytes([Dollar]) * w)
        tf.flush()

    try:
        cuts = chunked_cut_positions(code_pieces(), w, params.p, chunk)
        tf.close()
        C_len = state["clen"]
        starts, ends = phrase_bounds_from_cuts(C_len, cuts, w)
        if starts.shape[0] == 1:
            die("error: only one dict word total. Re-run with a smaller p "
                "modulus")
        from ..utils.limits import check_phrase_count

        check_phrase_count(starts.shape[0])
        T = np.memmap(tpath, dtype=np.uint8, mode="r")
        # impl='host': the device dedup builds O(nphrases * maxlen) rows in
        # RAM/HBM, defeating this path's bounded-memory contract
        dict_starts, dict_lens, occs, parse_ranks = _dedup_and_rank(
            T, starts, ends, impl="host"
        )
        last = np.asarray(T[ends - w])
        sai = ends.astype(np.uint64)
        res = ParseResult(
            params=params,
            text=T,
            dict_starts=dict_starts,
            dict_lens=dict_lens,
            occs=occs,
            parse_ranks=parse_ranks,
            last=last,
            sai=sai,
            doc_names=doc_names if params.store_docs else [],
            doc_starts=doc_starts if params.store_docs else [],
            pos=C_len + w,
            nseqs=state["nseqs"],
        )
        return res
    finally:
        if not tf.closed:
            tf.close()
        _os.unlink(tpath)
