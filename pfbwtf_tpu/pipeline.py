"""Staged pipeline driver: parse -> parse-BWT -> final BWT.

Replicates the reference's checkpoint protocol exactly (SURVEY.md §5.4):
``run_parser`` writes .dict/.occ/.parse/.n[/.docs] + .bwlast/.ilist[/.bwsai]
(pfbwt-f.cpp:209-245), and ``run_pfbwt`` resumes from exactly those files
(pfbwt-f.cpp:275-349), so the two stages can run in different processes /
invocations (--parse-only / --pfbwt-only).
"""

import sys
from dataclasses import dataclass
from typing import Optional

import numpy as np

from . import engine
from .constants import EndOfDict, EndOfWord, EXT
from .io import formats
from .utils.limits import check_phrase_count, check_text_width
from .utils.timer import task_timer
from .ops.parse import ParseResult, ParserParams

U32, U64 = formats.U32, formats.U64


def dict_flat_from_phrases(phrases) -> np.ndarray:
    body = bytes([EndOfWord]).join(phrases) + bytes([EndOfWord, EndOfDict])
    return np.frombuffer(body, dtype=np.uint8)


def save_parser(res: ParseResult, prefix: str, dtype=U64):
    """save_parser equivalent (pfbwt_io.hpp:234-249).

    The .dict writer streams bounded slabs straight from the flat
    (text, starts, lens) dictionary view — no per-phrase Python objects.
    Guards the output width before narrowing (pfparser.hpp:326-331,
    393-405 semantics).
    """
    check_text_width(res.n, dtype)
    check_phrase_count(res.parse_ranks.shape[0], dtype)
    with open(prefix + "." + EXT.DICT, "wb") as f:
        for slab in res.iter_dict_chunks():
            f.write(slab.tobytes())
    formats.write_occ(prefix + "." + EXT.OCC, res.occs, dtype)
    formats.write_parse_ranks(prefix + "." + EXT.PARSE, res.parse_ranks)
    if res.params.store_docs:
        formats.write_docs(prefix + "." + EXT.DOCS, res.doc_names, res.doc_starts)
    formats.write_n(prefix + "." + EXT.N, res.n)


def save_parse_bwt(res: ParseResult, prefix: str, dtype=U64, sa: bool = True,
                   backend: Optional[str] = None):
    """Stage-2 output (pfbwt_io.hpp:287-297)."""
    pb = engine.parse_bwt(res, get_sai=sa, backend=backend)
    formats.write_u8(prefix + "." + EXT.BWLST, pb.bwlast)
    formats.write_uint(prefix + "." + EXT.ILIST, pb.ilist, dtype)
    if sa:
        formats.write_uint(prefix + "." + EXT.BWSAI, pb.bwsai, dtype)
    return pb


@dataclass
class PfbwtConfig:
    prefix: str
    w: int = 10
    sa: bool = False
    rssa: bool = False
    verbose: bool = False
    dtype: np.dtype = U64
    stdout_ext: str = ""  # '-c <ext>': route one output to stdout
    backend: Optional[str] = None  # 'jax' | 'numpy' | None = auto
    mesh: object = None  # jax Mesh: run stage 3's sorts as collectives
    mmap: bool = False  # -m: memmap inputs + streamed bounded-RAM stage 3


def run_parser(
    in_fname: str, output: str, params: ParserParams, dtype=U64,
    backend: Optional[str] = None
) -> int:
    """Stage 1+2: parse, write checkpoint files; returns n."""
    with task_timer("parsing input"):
        res = engine.parse_fasta(in_fname, params, backend)
    with task_timer("finalizing parse, writing dict, occs, and ranks"):
        save_parser(res, output, dtype)
    with task_timer("ranking and bwt-ing parse and processing last-chars"):
        save_parse_bwt(res, output, dtype, sa=params.get_sai, backend=backend)
    if params.trim_non_acgt:
        # reference writes the (currently always-empty) non-ACGT run table
        # when trimming is requested (pfbwt-f.cpp:238-240; the trim path is
        # disabled upstream, pfparser.hpp:338-359)
        open(output + ".ntab", "wb").close()
    return res.n


def _out_handle(cfg: PfbwtConfig, ext: str):
    if cfg.stdout_ext == ext:
        return sys.stdout.buffer
    return open(cfg.prefix + "." + ext, "wb")


def run_pfbwt(cfg: PfbwtConfig, n: Optional[int] = None):
    """Stage 3: load checkpoint files, assemble final BWT, write outputs."""
    prefix = cfg.prefix
    if cfg.mmap:
        # -m mode: inputs stay file-backed (file_wrappers.hpp MMap role)
        def _mm(path, dtype):
            return np.memmap(path, dtype=dtype, mode="r")

        dict_flat = _mm(prefix + "." + EXT.DICT, np.uint8)
        occs = _mm(prefix + "." + EXT.OCC, cfg.dtype)
        bwlast = _mm(prefix + "." + EXT.BWLST, np.uint8)
        ilist = _mm(prefix + "." + EXT.ILIST, cfg.dtype)
    else:
        dict_flat = formats.read_dict_flat(prefix + "." + EXT.DICT)
        occs = formats.read_occ(prefix + "." + EXT.OCC, cfg.dtype)
        bwlast = formats.read_u8(prefix + "." + EXT.BWLST)
        ilist = formats.read_uint(prefix + "." + EXT.ILIST, cfg.dtype)
    any_sa = cfg.sa or cfg.rssa
    if not any_sa:
        bwsai = None
    elif cfg.mmap:
        bwsai = np.memmap(prefix + "." + EXT.BWSAI, dtype=cfg.dtype,
                          mode="r")
    else:
        bwsai = formats.read_uint(prefix + "." + EXT.BWSAI, cfg.dtype)
    if n is None:
        n = formats.read_n(prefix + "." + EXT.N)
    check_text_width(n, cfg.dtype)
    if cfg.mmap:
        return _run_pfbwt_stream(cfg, dict_flat, occs, bwlast, ilist,
                                 bwsai, n)
    with task_timer(
        "generating final BWT w/ full and/or run-length SA"
        if any_sa
        else "generating final BWT w/o SA"
    ):
        if cfg.mesh is not None:
            from .parallel.pfbwt_mesh import mesh_assemble_bwt

            res = mesh_assemble_bwt(
                dict_flat, cfg.w, occs.astype(np.int64), bwlast,
                ilist.astype(np.int64), bwsai, n, cfg.mesh,
                want_sa=cfg.sa, want_rssa=cfg.rssa, sa_dtype=cfg.dtype,
            )
        else:
            res = engine.assemble_bwt(
                dict_flat,
                cfg.w,
                occs.astype(np.int64),
                bwlast,
                ilist.astype(np.int64),
                bwsai,
                n,
                want_sa=cfg.sa,
                want_rssa=cfg.rssa,
                sa_dtype=cfg.dtype,
                backend=cfg.backend,
            )
    bwt_fp = _out_handle(cfg, EXT.BWT)
    bwt_fp.write(res.bwt.tobytes())
    if bwt_fp is not sys.stdout.buffer:
        bwt_fp.close()
    if cfg.sa:
        sa_fp = _out_handle(cfg, EXT.SA)
        sa_fp.write(res.sa.astype(cfg.dtype).tobytes())
        if sa_fp is not sys.stdout.buffer:
            sa_fp.close()
    if cfg.rssa:
        with open(prefix + "." + EXT.SSA, "wb") as f:
            f.write(res.ssa.astype(cfg.dtype).tobytes())
        with open(prefix + "." + EXT.ESA, "wb") as f:
            f.write(res.esa.astype(cfg.dtype).tobytes())
    print(f"n: {n}", file=sys.stderr)
    print(f"r: {res.nruns}", file=sys.stderr)
    print(f"n/r: {n / res.nruns:.3f}", file=sys.stderr)
    return res


def _run_pfbwt_stream(cfg: PfbwtConfig, dict_flat, occs, bwlast, ilist,
                      bwsai, n):
    """-m stage 3: streamed bounded-RAM assembly straight into the output
    files + .gsa/.glcp workspace spill (ops/bwt_mmap)."""
    from .ops.bwt_mmap import assemble_bwt_stream

    with task_timer(
        "generating final BWT (mmap mode)"
    ):
        bwt_fp = _out_handle(cfg, EXT.BWT)
        sa_fp = _out_handle(cfg, EXT.SA) if cfg.sa else None
        try:
            nruns, ssa, esa = assemble_bwt_stream(
                dict_flat, cfg.w, np.asarray(occs).astype(np.int64),
                bwlast, ilist, bwsai, n,
                bwt_fp, sa_fp=sa_fp, want_rssa=cfg.rssa,
                sa_dtype=cfg.dtype, workspace_prefix=cfg.prefix,
                workspace_dtype=cfg.dtype,
            )
        finally:
            if bwt_fp is not sys.stdout.buffer:
                bwt_fp.close()
            if sa_fp is not None and sa_fp is not sys.stdout.buffer:
                sa_fp.close()
    if cfg.rssa:
        with open(cfg.prefix + "." + EXT.SSA, "wb") as f:
            f.write(ssa.astype(cfg.dtype).tobytes())
        with open(cfg.prefix + "." + EXT.ESA, "wb") as f:
            f.write(esa.astype(cfg.dtype).tobytes())
    print(f"n: {n}", file=sys.stderr)
    print(f"r: {nruns}", file=sys.stderr)
    print(f"n/r: {n / nruns:.3f}", file=sys.stderr)
    return nruns
