"""Backend-selecting engine: numpy reference path vs device (JAX) path.

The numpy path is the exactness oracle (byte-verified at every stage
against the reference implementation); the JAX path runs the same
algorithms on TPU and is cross-checked against the numpy path in tests.

Backend resolution: PFBWT_BACKEND env var ('jax'|'numpy'), else 'jax' when
an accelerator (non-CPU) device is present, else 'numpy'.
"""

import os
from typing import Optional

import numpy as np

from .ops import bwt as bwt_np
from .ops import parse as parse_ops
from .ops.parse import ParserParams, ParseResult
from .ops.parse_bwt import ParseBWT, bwt_of_parse


def enable_device_pipeline():
    """Route every heavy stage through the accelerator: hash scan + cut
    compaction, dict chunk-row sort, parse-BWT (doubling SA + permutes),
    emission-sort assembly, and the SA->MA permute.  Host work left: file
    IO and O(#phrases)/O(#dict-words) metadata."""
    os.environ.setdefault("PFBWT_BACKEND", "jax")
    os.environ.setdefault("PFBWT_DICT_IMPL", "jax")
    os.environ.setdefault("PFBWT_ASSEMBLE_BACKEND", "jax")
    os.environ.setdefault("PFBWT_MA_BACKEND", "jax")


def default_backend() -> str:
    env = os.environ.get("PFBWT_BACKEND", "").lower()
    if env in ("jax", "numpy"):
        return env
    try:
        import jax

        if any(d.platform != "cpu" for d in jax.devices()):
            return "jax"
    except Exception:
        pass
    return "numpy"


def _bucket_size(n: int) -> int:
    """Round n up to a coarse grid (granularity n/8, floor 64K): bounded
    shape count for the compile cache, <=12.5% padding waste."""
    if n <= (1 << 16):
        return 1 << 16
    step = 1 << max(16, int(np.floor(np.log2(n))) - 3)
    return -(-n // step) * step


def parse_stream(C: np.ndarray, params: ParserParams, backend: Optional[str] = None):
    """Cut positions -> phrase bounds, device or host."""
    backend = backend or default_backend()
    if backend == "jax":
        import jax

        from .utils.tables import NTOA_TABLE
        from .utils.errors import die

        codes = NTOA_TABLE[C]
        if codes.max(initial=0) > 3:
            bad = C[codes > 3][0]
            die(f"invalid character {bad}/{chr(bad)} in input "
                "(use --non-acgt-to-a)")

        scan_impl = os.environ.get("PFBWT_SCAN_IMPL", "xla").lower()
        if scan_impl == "pallas" and jax.default_backend() != "tpu":
            scan_impl = "xla"  # the compiled kernel is TPU-only

        # Bucket the input length to a power-of-two-ish grid so compiled
        # programs are reused across inputs; pad codes are 0 ('A'), whose
        # spurious cuts beyond the true length are stripped below.
        n = codes.shape[0]
        bucket = _bucket_size(n)
        padded = np.zeros(bucket, dtype=np.uint8)
        padded[:n] = codes
        dev_codes = jax.device_put(padded)
        ncuts = int(
            np.asarray(_count_cuts(dev_codes, params.w, params.p, scan_impl))
        )
        if ncuts == 0:
            cuts = np.zeros(0, dtype=np.int64)
        else:
            # bucket the compaction size to limit recompiles
            size = 1 << max(10, int(np.ceil(np.log2(ncuts))))
            pos = np.asarray(
                _cut_positions(dev_codes, params.w, params.p, size, scan_impl)
            )
            pos = pos[:ncuts]
            cuts = pos[pos < n].astype(np.int64)
        return parse_ops.phrase_bounds_from_cuts(C.shape[0], cuts, params.w)
    return parse_ops.parse_stream_np(C, params)


def _cut_mask_device(c, w: int, p: int, scan_impl: str):
    import jax.numpy as jnp

    from .ops.hash import hash_scan_jax

    if scan_impl == "pallas":
        # bucketed input lengths are multiples of 2**16 == the kernel
        # block, so no tail handling is needed
        from .ops.pallas.hash_scan import _scan as pallas_scan, LEAD

        blk = 1 << 16
        padded = jnp.pad(c, (LEAD, 0))
        m = pallas_scan(padded, w, p, blk, False)[: c.shape[0]].astype(bool)
        idx = jnp.arange(c.shape[0], dtype=jnp.int64)
        return m & (idx >= w)
    _, cut = hash_scan_jax(c, w, p)
    return cut


# Two-phase cut extraction keeps device->host traffic minimal (the remote
# tunnel's D2H path is slow): first a scalar count, then the compacted
# positions at a bucketed static size.  Module-level jits so repeated calls
# reuse traces.
def _make_jits():
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("w", "p", "scan_impl"))
    def count_cuts(c, w, p, scan_impl):
        return jnp.sum(_cut_mask_device(c, w, p, scan_impl).astype(jnp.int64))

    @partial(jax.jit, static_argnames=("w", "p", "size", "scan_impl"))
    def cut_positions(c, w, p, size, scan_impl):
        from .ops.suffix import compact_indices_jax

        return compact_indices_jax(
            _cut_mask_device(c, w, p, scan_impl), size, fill=-1
        ).astype(jnp.int64)

    return count_cuts, cut_positions


_count_cuts, _cut_positions = _make_jits()


def parse_records(records, params: ParserParams, backend: Optional[str] = None) -> ParseResult:
    C, doc_names, doc_starts = parse_ops.build_stream(records, params)
    starts, ends = parse_stream(C, params, backend)
    return parse_ops.finalize_parse(
        C,
        starts,
        ends,
        params,
        doc_names=doc_names if params.store_docs else [],
        doc_starts=doc_starts if params.store_docs else [],
        nseqs=len(records),
    )


def parse_fasta(fname: str, params: ParserParams, backend: Optional[str] = None) -> ParseResult:
    from .io.fasta import read_fasta_bytes

    return parse_records(read_fasta_bytes(fname), params, backend)


def parse_bwt(res_or_ranks, last=None, sai=None, get_sai=True,
              backend: Optional[str] = None) -> ParseBWT:
    backend = backend or default_backend()
    if isinstance(res_or_ranks, ParseResult):
        ranks, last, sai = (
            res_or_ranks.parse_ranks,
            res_or_ranks.last,
            res_or_ranks.sai,
        )
    else:
        ranks = res_or_ranks
    if backend == "jax":
        from .ops.parse_bwt import bwt_of_parse_device

        return bwt_of_parse_device(ranks, last, sai, get_sai=get_sai)
    return bwt_of_parse(ranks, last, sai, get_sai=get_sai)


def assemble_bwt(dict_flat, w, occs, bwlast, ilist, bwsai, n,
                 want_sa=False, want_rssa=False, sa_dtype=np.uint64,
                 backend: Optional[str] = None) -> bwt_np.BWTResult:
    # Assembly defaults to the host path (native SA-IS) even when an
    # accelerator is present: its outputs are large (the .bwt/.sa arrays
    # themselves), so on a remote-tunnel single chip the D2H cost and
    # per-size recompiles dominate.  Opt in to the device path with
    # PFBWT_ASSEMBLE_BACKEND=jax (or an explicit backend argument) — the
    # right choice on locally-attached chips at scale.
    if backend is None:
        backend = os.environ.get("PFBWT_ASSEMBLE_BACKEND", "").lower() or None
    if backend is None:
        env = os.environ.get("PFBWT_BACKEND", "").lower()
        backend = env if env in ("jax", "numpy") else "numpy"
    if backend == "jax":
        from .ops.bwt_jax import assemble_bwt_jax

        return assemble_bwt_jax(
            dict_flat, w, occs, bwlast, ilist, bwsai, n,
            want_sa=want_sa, want_rssa=want_rssa, sa_dtype=sa_dtype,
        )
    return bwt_np.assemble_bwt(
        dict_flat, w, occs, bwlast, ilist, bwsai, n,
        want_sa=want_sa, want_rssa=want_rssa, sa_dtype=sa_dtype,
    )
