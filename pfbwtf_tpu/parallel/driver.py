"""Pod-style distributed parse driver.

The production multi-host recipe (SURVEY.md §2.4): split the input into
contiguous shards, parse every shard independently (each host/chip runs the
device hash scan on its shard — embarrassingly parallel, the junction
identity makes shard boundaries exact), persist per-shard parse
checkpoints, then fold them with the collective merge and run the final
assembly once.

Runnable single-host with a process pool standing in for hosts; on a real
pod each worker is a jax.distributed process and the merge's concatenated
reparse becomes the sharded scan + global phrase sort.  The equivalence
test (sharded == single-shot, any shard count) is the multi-host
correctness harness.
"""

import multiprocessing as mp
import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional

import numpy as np

from ..io.fasta import read_fasta_bytes
from ..ops.parse import ParserParams
from ..pipeline import save_parse_bwt, save_parser
from .merge import merge_parse_prefixes


def split_fasta(fname: str, nshards: int, out_prefix: str) -> List[str]:
    """Split a FASTA into ``nshards`` record-aligned shard files.

    Shards are record-aligned (every record is padded with w 'A's by the
    parser, which is exactly the condition that makes shard junctions
    exact).  Records are distributed contiguously with balanced bytes.
    """
    records = read_fasta_bytes(fname)
    if not records:
        raise ValueError(f"{fname}: no records")
    nshards = min(nshards, len(records))
    total = sum(s.shape[0] for _, s in records)
    target = total / nshards
    shards: List[List] = [[] for _ in range(nshards)]
    acc = 0
    si = 0
    for name, seq in records:
        if shards[si] and acc >= target * (si + 1) and si < nshards - 1:
            si += 1
        shards[si].append((name, seq))
        acc += seq.shape[0]
    paths = []
    for i, recs in enumerate(shards):
        path = f"{out_prefix}.shard{i}.fa"
        with open(path, "w") as f:
            for name, seq in recs:
                f.write(f">{name}\n{seq.tobytes().decode('ascii')}\n")
        paths.append(path)
    return [p for p, recs in zip(paths, shards) if recs]


def _parse_one(args):
    path, prefix, params_kw, dtype_code = args
    # worker processes: keep host backend (device is a per-host resource on
    # a real pod; in the single-host stand-in the chip is not shared)
    os.environ.setdefault("PFBWT_BACKEND", "numpy")
    from ..io import formats
    from ..ops.parse import ParserParams, parse_fasta

    params = ParserParams(**params_kw)
    res = parse_fasta(path, params)
    dtype = formats.U32 if dtype_code == 32 else formats.U64
    save_parser(res, prefix, dtype)
    return prefix


def pod_parse(
    fname: str,
    output: str,
    params: ParserParams,
    nshards: int = 4,
    workers: Optional[int] = None,
    dtype=None,
):
    """Split + parallel shard parse + collective merge -> merged parse
    checkpoint at ``output`` (ready for --pfbwt-only)."""
    from ..io import formats

    dtype = dtype if dtype is not None else formats.U64
    shard_paths = split_fasta(fname, nshards, output)
    params_kw = dict(
        w=params.w, p=params.p, get_sai=params.get_sai,
        store_docs=params.store_docs, non_acgt_to_a=params.non_acgt_to_a,
    )
    dtype_code = 32 if dtype == formats.U32 else 64
    jobs = [
        (path, f"{output}.shard{i}", params_kw, dtype_code)
        for i, path in enumerate(shard_paths)
    ]
    if workers and workers > 1:
        # spawn, never fork: the parent holds JAX's thread pools and a
        # forked child can deadlock in them (multi-threaded-fork class)
        ctx = mp.get_context("spawn")
        with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as ex:
            prefixes = list(ex.map(_parse_one, jobs))
    else:
        prefixes = [_parse_one(j) for j in jobs]
    merged = merge_parse_prefixes(prefixes, params)
    save_parser(merged, output, dtype)
    save_parse_bwt(merged, output, dtype, sa=params.get_sai)
    return merged
