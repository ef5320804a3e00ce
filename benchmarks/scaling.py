"""Scaling-efficiency harness: weak scaling over mesh sizes.

Two steps, selectable with --step:

* ``parse`` — the halo-exchange parse scan (parallel/sharded.py).  The
  communication is one (w-1)-byte ppermute plus a scalar psum per step,
  so the EXPECTED weak-scaling efficiency is

      eff(d) ~= S / (S + B_halo + d_latency)

  with S = shard bytes and B_halo = (w-1): essentially flat (>99%) at
  any real shard size — if a real-pod run shows materially less, the
  gap is dispatch/latency, not algorithm.

* ``dsort`` — one pass of the distributed sample-sort
  (parallel/dsort.py dsort_blocks), the communication-heavy core of the
  distributed doubling + emission sorts.  Each pass moves ~all shard
  bytes once through an all_to_all plus splitter all_gathers, so the
  model is

      eff(d) ~= t_local(S) / (t_local(S) + S/BW_ici + a2a_lat(d))

  On v5e, BW_ici ~ 186 GB/s/link: a 64 MB/device shard pays ~0.4 ms of
  wire time per pass — efficiency should stay >=70% as long as local
  sort time dominates, which is what this harness verifies.

Runs meshes of 1, 2, 4, ... N devices with a FIXED per-device shard
(weak scaling — the pod recipe: more chips == more genome) and reports
MB/s plus efficiency relative to the single-device rate.  One JSON line
per mesh size:

    {"devices": d, "mbps": ..., "efficiency": ...}

Defaults to 64 MB/device (the size where results are meaningful —
trivially small shards are latency-dominated and flatter nothing).  On
real hardware run it on the pod slice; in this repo's CI it runs on the
virtual 8-device CPU mesh with a small shard:

    JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py --shard-mb 1 --step parse

NOTE: efficiency numbers from the CPU mesh on a small VM are
physically meaningless (all "devices" share two cores); the harness
exists so a real multi-chip run is one command.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _mesh_sizes(n_devices: int):
    sizes = []
    d = 1
    while d <= n_devices:
        sizes.append(d)
        d *= 2
    if sizes[-1] != n_devices:
        sizes.append(n_devices)
    return sizes


def bench_parse(shard_mb: float, w: int, p: int, iters: int):
    import jax

    from pfbwtf_tpu.parallel.sharded import make_parse_mesh, \
        sharded_parse_step

    devices = jax.devices()
    shard_len = int(shard_mb * (1 << 20))
    rng = np.random.default_rng(0)
    results = []
    base_mbps = None
    for nd in _mesh_sizes(len(devices)):
        mesh = make_parse_mesh(devices[:nd])
        step = sharded_parse_step(w, p, mesh, shard_len)
        blocks = rng.integers(0, 4, size=(nd, shard_len), dtype=np.uint8)
        cut, total = step(blocks)  # compile + warm
        np.asarray(total)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            cut, total = step(blocks)
            np.asarray(total)  # forces completion through the tunnel
            best = min(best, time.perf_counter() - t0)
        mbps = nd * shard_len / best / 1e6
        if base_mbps is None:
            base_mbps = mbps / nd
        eff = mbps / (base_mbps * nd)
        row = {"step": "parse", "devices": nd, "shard_mb": shard_mb,
               "mbps": round(mbps, 1), "efficiency": round(eff, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def bench_dsort(shard_mb: float, iters: int):
    """One distributed sample-sort pass per mesh size: the per-pass cost
    of every distributed doubling round and of the final emission sort
    (parallel/dsort.py), i.e. the communication-bound piece whose weak
    scaling decides pod efficiency."""
    import jax

    from pfbwtf_tpu.parallel.dsort import dsort_blocks
    from pfbwtf_tpu.parallel.sharded import make_parse_mesh

    devices = jax.devices()
    # shard_mb of int64 keys per device
    shard_len = int(shard_mb * (1 << 20) // 8)
    rng = np.random.default_rng(1)
    results = []
    base_mbps = None
    for nd in _mesh_sizes(len(devices)):
        mesh = make_parse_mesh(devices[:nd])
        keys = rng.integers(
            0, 1 << 62, size=(nd, shard_len), dtype=np.int64
        ).astype(np.uint64)
        vals = np.arange(nd * shard_len, dtype=np.int64).reshape(
            nd, shard_len
        )
        out = dsort_blocks(mesh, "dp", keys, vals)  # compile + warm
        np.asarray(out[0])
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = dsort_blocks(mesh, "dp", keys, vals)
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        mbps = nd * shard_len * 8 / best / 1e6
        if base_mbps is None:
            base_mbps = mbps / nd
        eff = mbps / (base_mbps * nd)
        row = {"step": "dsort", "devices": nd, "shard_mb": shard_mb,
               "mbps": round(mbps, 1), "efficiency": round(eff, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


def bench_fused_mesh(shard_mb: float, w: int, p: int, iters: int,
                     copies: int = 8, snp_rate: float = 0.001):
    """The FULL distributed pipeline (parallel/fused_mesh.py) per mesh
    size: sharded parse + collective dict union + dict-scale emitter
    table + distributed emission sample-sort + sharded decode, end to
    end (including output fetch — the pod-run wall-clock a user sees).

    Weak scaling: the input is a pangenome of ``nd * shard_mb`` total —
    one mutated copy-set of a fixed-size unit, so the dict stays
    unit-scale while the emission volume grows with the mesh.  This is
    exactly BASELINE config 3/4's workload shape, one command on a pod:

        python benchmarks/scaling.py --step fused_mesh --shard-mb 64
    """
    import jax

    from pfbwtf_tpu.ops.parse import ParserParams
    from pfbwtf_tpu.parallel.fused_mesh import pfbwt_fused_mesh_records
    from pfbwtf_tpu.parallel.sharded import make_parse_mesh

    devices = jax.devices()
    rng = np.random.default_rng(2)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    results = []
    base_mbps = None
    params = ParserParams(w=w, p=p)
    for nd in _mesh_sizes(len(devices)):
        mesh = make_parse_mesh(devices[:nd])
        total = int(nd * shard_mb * (1 << 20))
        unit = acgt[rng.integers(0, 4, size=max(total // copies, 1))]
        records = []
        for i in range(copies):
            hap = unit.copy()
            nmut = int(hap.size * snp_rate)
            pos = rng.integers(0, hap.size, size=max(nmut, 1))
            hap[pos] = acgt[rng.integers(0, 4, size=pos.size)]
            records.append((f"hap{i}", hap))
        res = pfbwt_fused_mesh_records(records, params, mesh,
                                       want_sa=True)  # compile + warm
        assert res.bwt.size > 0
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            res = pfbwt_fused_mesh_records(records, params, mesh,
                                           want_sa=True)
            best = min(best, time.perf_counter() - t0)
        mbps = total / best / 1e6
        if base_mbps is None:
            base_mbps = mbps / nd
        eff = mbps / (base_mbps * nd)
        row = {"step": "fused_mesh", "devices": nd, "shard_mb": shard_mb,
               "mbps": round(mbps, 2), "efficiency": round(eff, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard-mb", type=float, default=64.0,
                    help="per-device shard size (weak scaling)")
    ap.add_argument("--step",
                    choices=("parse", "dsort", "fused_mesh", "both", "all"),
                    default="both")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("-w", type=int, default=10)
    ap.add_argument("-p", type=int, default=100)
    args = ap.parse_args()
    if args.step in ("parse", "both", "all"):
        bench_parse(args.shard_mb, args.w, args.p, args.iters)
    if args.step in ("dsort", "both", "all"):
        bench_dsort(args.shard_mb, args.iters)
    if args.step in ("fused_mesh", "all"):
        bench_fused_mesh(args.shard_mb, args.w, args.p, args.iters)
