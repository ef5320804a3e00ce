"""Scaling-efficiency harness: sharded parse throughput vs mesh size.

Runs the halo-exchange parse step (parallel/sharded.py) over meshes of
1, 2, 4, ... N devices with a FIXED per-device shard (weak scaling — the
pod recipe: more chips == more genome), and reports MB/s plus efficiency
relative to the single-device rate.  Prints one JSON line per mesh size:

    {"devices": d, "mbps": ..., "efficiency": ...}

On real hardware run it on the pod slice; in this repo's CI it runs on the
virtual 8-device CPU mesh:

    JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py
"""

import json
import sys
import time

import numpy as np


def bench_scaling(shard_mb: float = 4.0, w: int = 10, p: int = 100,
                  iters: int = 3):
    import jax

    from pfbwtf_tpu.parallel.sharded import make_parse_mesh, \
        sharded_parse_step

    devices = jax.devices()
    shard_len = int(shard_mb * (1 << 20))
    sizes = []
    d = 1
    while d <= len(devices):
        sizes.append(d)
        d *= 2
    if sizes[-1] != len(devices):
        sizes.append(len(devices))

    rng = np.random.default_rng(0)
    results = []
    base_mbps = None
    for nd in sizes:
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
        row = {"devices": nd, "mbps": round(mbps, 1),
               "efficiency": round(eff, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    shard_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    bench_scaling(shard_mb=shard_mb)
