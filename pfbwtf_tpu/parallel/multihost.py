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
