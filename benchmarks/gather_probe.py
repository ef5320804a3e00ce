"""On-chip probe: can a VMEM-resident table turn the emission pipeline's
random gathers from HBM-latency-bound into VMEM lookups?

The J3 hot spot is table gathers whose tables are SMALL (ilist/P3 are
m-scale ~6-9 MB at 64 MB input — they fit VMEM) while the index stream is
HUGE (total_b ~75 M lanes).  XLA lowers `table[idx]` to an HBM gather
whose in-program cost measured 8.6 s at 64 MB (j3_slice_probe).  A Pallas
kernel that pins the table in VMEM and streams index blocks through
should run at index-stream bandwidth instead.

Tries several formulations (Mosaic dynamic-gather support varies by
op/dtype/axis — interpret mode does NOT predict what lowers, per the
hash_scan kernel's findings) and times whichever compile against the XLA
take() baseline.

Usage: python benchmarks/gather_probe.py [table_elems] [n_idx]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pfbwtf_tpu  # noqa: F401  (x64 + compile cache)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TBL = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
NIDX = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 24
ROWS = 8  # i32 sublane tile
COLS = 1024  # lanes per row block (multiple of 128)
BLK = ROWS * COLS


def _time(label, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    gbs = NIDX * 4 / best / 1e9
    print(f"{label:28s} {best*1e3:9.2f} ms  {gbs:7.1f} GB/s-of-idx")
    return out


def xla_take(table, idx):
    return jnp.take(table, idx, mode="promise_in_bounds")


# -- formulation 1: flat jnp.take inside the kernel ------------------------


def _k_take(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[:].reshape(-1)
    out_ref[:] = jnp.take(tbl, idx_ref[:], mode="promise_in_bounds")


def pallas_take(table, idx):
    tbl2 = table.reshape(-1, COLS)
    idx2 = idx.reshape(-1, COLS)
    n_blk = idx2.shape[0] // ROWS
    return pl.pallas_call(
        _k_take,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, table.dtype),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(
                tbl2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tbl2, idx2).reshape(-1)


# -- formulation 2: take_along_axis on the lane axis -----------------------


def _k_tala(tbl_ref, idx_ref, out_ref):
    # table replicated to every sublane row: gather along lanes only
    tbl = tbl_ref[:]  # (1, T)
    idx = idx_ref[:]  # (ROWS, COLS)
    t = jnp.broadcast_to(tbl, (ROWS, tbl.shape[1]))
    out_ref[:] = jnp.take_along_axis(t, idx, axis=1)


def pallas_tala(table, idx):
    tbl2 = table.reshape(1, -1)
    idx2 = idx.reshape(-1, COLS)
    n_blk = idx2.shape[0] // ROWS
    return pl.pallas_call(
        _k_tala,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, table.dtype),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(
                tbl2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tbl2, idx2).reshape(-1)


# -- formulation 3: one-row-at-a-time dynamic_gather via vmap-free loop ----


def _k_rows(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[:]  # (1, T)
    for r in range(ROWS):
        row_idx = idx_ref[r, :].reshape(1, COLS)
        g = jnp.take_along_axis(
            jnp.broadcast_to(tbl, (1, tbl.shape[1])),
            jnp.clip(row_idx, 0, tbl.shape[1] - 1),
            axis=1,
        )
        out_ref[r, :] = g[0]


def pallas_rows(table, idx):
    tbl2 = table.reshape(1, -1)
    idx2 = idx.reshape(-1, COLS)
    n_blk = idx2.shape[0] // ROWS
    return pl.pallas_call(
        _k_rows,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, table.dtype),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(
                tbl2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tbl2, idx2).reshape(-1)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(0, 1 << 30, size=TBL, dtype=np.int32)
    )
    idx = jnp.asarray(rng.integers(0, TBL, size=NIDX, dtype=np.int32))
    print(f"table {TBL} i32 ({TBL*4/1e6:.1f} MB), idx {NIDX}")
    ref = _time("xla take", xla_take, table, idx)
    for label, fn in (
        ("pallas flat take", pallas_take),
        ("pallas take_along_axis", pallas_tala),
        ("pallas row loop", pallas_rows),
    ):
        out = _time(label, fn, table, idx)
        if out is not None and ref is not None:
            ok = bool(jnp.array_equal(out, ref))
            print(f"    matches xla: {ok}")


if __name__ == "__main__":
    main()
