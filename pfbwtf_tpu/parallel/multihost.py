"""Multi-host bring-up: jax.distributed + the pod parse recipe.

The reference's "cluster" is a process pool on one machine feeding Unix
pipes (vcf_to_bwt.py:230-237).  At pod scale the same dataflow is SPMD:

* every process (host) initializes `jax.distributed` and joins one global
  mesh over all chips;
* each host parses its contiguous record range of the input locally
  (embarrassingly parallel — the w-pad junction identity makes shard
  boundaries exact, pfparser.hpp:194-263);
* the dictionary union/rank runs as collectives over the global mesh
  (parallel/dict_union.py: all_to_all sample-sort on ICI within a slice,
  DCN across slices), or — filesystem mode — per-host parse checkpoints
  are folded by process 0 with the exact merge (parallel/merge.py).

Run on each host (or under `gcloud ... tpu-vm ssh --worker=all`):

    python -m pfbwtf_tpu.parallel.multihost input.fa -o /shared/out

Coordinator/process ids come from the TPU metadata on Cloud TPU VMs
(jax.distributed.initialize() auto-detects); elsewhere set
JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID.
"""

import argparse
import os
import sys
from typing import Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed (idempotent, single-process safe).

    Returns (process_index, process_count)."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # Cloud TPU pod slice: initialize() auto-detects from metadata; on
        # a single host it is a no-op-equivalent and may raise — tolerate.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
    return jax.process_index(), jax.process_count()


def _my_record_range(nrecords: int, pid: int, nprocs: int):
    per = -(-nrecords // nprocs)
    lo = min(pid * per, nrecords)
    return lo, min(lo + per, nrecords)


def multihost_parse(fasta: str, output: str, params, dtype=None,
                    barrier: bool = True):
    """SPMD pod parse: each process parses its record range and writes
    ``{output}.host{pid}``; process 0 folds the shards with the exact
    merge and writes the merged checkpoint (+ parse-BWT) at ``output``.

    ``output`` must live on storage visible to all hosts."""
    import jax

    from ..io import formats
    from ..io.fasta import read_fasta_bytes
    from ..ops.parse import parse_records
    from ..pipeline import save_parse_bwt, save_parser
    from .merge import merge_parse_prefixes

    dtype = dtype if dtype is not None else formats.U64
    pid, nprocs = jax.process_index(), jax.process_count()
    records = read_fasta_bytes(fasta)
    lo, hi = _my_record_range(len(records), pid, nprocs)
    prefix = f"{output}.host{pid}"
    if hi > lo:
        res = parse_records(records[lo:hi], params)
        save_parser(res, prefix, dtype)
    if barrier and nprocs > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pfbwt_multihost_parse")
    if pid != 0:
        return None
    prefixes = [
        f"{output}.host{i}"
        for i in range(nprocs)
        if _my_record_range(len(records), i, nprocs)[1]
        > _my_record_range(len(records), i, nprocs)[0]
    ]
    merged = merge_parse_prefixes(prefixes, params)
    save_parser(merged, output, dtype)
    save_parse_bwt(merged, output, dtype, sa=params.get_sai)
    return merged


def global_mesh(axis: str = "dp"):
    """One mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def multihost_rank_rows(cols_local: np.ndarray, mesh, axis: str = "dp"):
    """Cross-PROCESS collective phrase rank: each process contributes its
    local chunk rows; the union/rank runs as parallel/dict_union.py's
    sample-sort collectives over the GLOBAL mesh (the pod-scale merge of
    SURVEY §5.8 — no filesystem fold).  Returns (global_idx, rank) pairs
    covering every process's rows, replicated to all processes, plus this
    process's global row-id offset."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from .dict_union import (
        _count_program,
        _rank_program,
        _round_up,
        _U64MAX,
    )

    pid = jax.process_index()
    my_devs = [d for d in mesh.devices.flat if d.process_index == pid]
    n_local_dev = len(my_devs)
    n_dev = mesh.devices.size
    N_local, ncols_local = cols_local.shape

    # agree on row width / per-device capacity / global id offsets
    sizes = multihost_utils.process_allgather(
        np.array([N_local, ncols_local], dtype=np.int64)
    ).reshape(-1, 2)
    ncols = int(sizes[:, 1].max(initial=1))
    cap = _round_up(
        max(1, -(-int(sizes[:, 0].max(initial=1)) // n_local_dev)), 256
    )
    offset = int(sizes[:pid, 0].sum())

    local_blk = np.full((n_local_dev, cap, ncols), _U64MAX, np.uint64)
    local_idx = np.full((n_local_dev, cap), -1, np.int64)
    local_blk.reshape(-1, ncols)[:N_local, :ncols_local] = cols_local
    local_idx.reshape(-1)[:N_local] = offset + np.arange(
        N_local, dtype=np.int64
    )
    sh3 = NamedSharding(mesh, P(axis, None, None))
    sh2 = NamedSharding(mesh, P(axis, None))
    g_cols = jax.make_array_from_process_local_data(sh3, local_blk)
    g_idx = jax.make_array_from_process_local_data(sh2, local_idx)

    counts = _count_program(mesh, axis, n_dev, cap, ncols)(g_cols, g_idx)
    rep = NamedSharding(mesh, P())
    pair_max = int(
        np.asarray(jax.jit(jnp.max, out_shardings=rep)(counts))
    )
    pair_cap = max(64, _round_up(pair_max, 64))
    out_idx, out_rank = _rank_program(
        mesh, axis, n_dev, cap, pair_cap, ncols
    )(g_cols, g_idx)
    # replicate the (idx, rank) pairs so every process can pick its rows
    gather = jax.jit(lambda a, b: (a, b), out_shardings=(rep, rep))
    all_idx, all_rank = gather(out_idx, out_rank)
    return (
        np.asarray(all_idx).reshape(-1),
        np.asarray(all_rank).reshape(-1),
        offset,
    )


def multihost_union_parse(fasta: str, output: str, params, dtype=None):
    """SPMD parse whose dictionary union/rank is a cross-process
    COLLECTIVE (multihost_rank_rows) rather than a process-0 fold: the
    cut scan is recomputed per process (it runs at GB/s and the input is
    already local), phrase occurrences are sliced evenly across
    processes, and the heavyweight stage — the distributed string sort —
    spans every device of every host.  Process 0 writes the standard
    checkpoint (+ parse-BWT)."""
    import jax

    from ..io import formats
    from ..io.fasta import read_fasta_bytes
    from ..ops.parse import (
        ParseResult,
        _tprime,
        build_stream,
        parse_stream_np,
    )
    from ..pipeline import save_parse_bwt, save_parser
    from .dict_union import phrase_chunk_rows

    dtype = dtype if dtype is not None else formats.U64
    pid, nprocs = jax.process_index(), jax.process_count()
    records = read_fasta_bytes(fasta)
    C, doc_names, doc_starts = build_stream(records, params)
    starts, ends = parse_stream_np(C, params)
    T = _tprime(C, params.w)
    nph = starts.shape[0]
    lo, hi = _my_record_range(nph, pid, nprocs)
    cols = phrase_chunk_rows(T, starts[lo:hi], ends[lo:hi])

    mesh = global_mesh()
    all_idx, all_rank, _ = multihost_rank_rows(cols, mesh)
    if pid != 0:
        return None
    keep = all_idx >= 0
    ranks = np.zeros(nph, dtype=np.int64)
    ranks[all_idx[keep]] = all_rank[keep]
    if nph and ranks.min() < 1:
        from ..utils.errors import die

        die("multihost union: unassigned occurrence (collective bug)")
    D = int(ranks.max(initial=0))
    occs = np.bincount(ranks, minlength=D + 1)[1:].astype(np.uint64)
    _, first = np.unique(ranks, return_index=True)
    lens = (ends - starts + 1).astype(np.int64)
    res = ParseResult(
        params=params,
        text=T,
        dict_starts=starts[first].astype(np.int64),
        dict_lens=lens[first],
        occs=occs,
        parse_ranks=ranks.astype(np.uint32),
        last=T[ends - params.w],
        sai=ends.astype(np.uint64),
        doc_names=list(doc_names or []),
        doc_starts=list(doc_starts or []),
        pos=C.shape[0] + params.w,
        nseqs=len(records),
    )
    save_parser(res, output, dtype)
    save_parse_bwt(res, output, dtype, sa=params.get_sai)
    return res


def main(argv=None):
    from ..ops.parse import ParserParams

    ap = argparse.ArgumentParser(prog="pfbwt-multihost")
    ap.add_argument("fasta")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-w", "--window-size", type=int, default=10, dest="w")
    ap.add_argument("-p", "--mod-val", type=int, default=100, dest="p")
    ap.add_argument("-s", "--sa", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args(argv)
    pid, nprocs = init_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    print(f"process {pid}/{nprocs} up; local devices: "
          f"{len(__import__('jax').local_devices())}", file=sys.stderr)
    params = ParserParams(w=args.w, p=args.p, get_sai=args.sa)
    multihost_parse(args.fasta, args.output, params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
