"""Distributed sort/gather primitives + distributed doubling vs the
single-device kernels, on the 8-device CPU mesh."""

import numpy as np
import pytest

from pfbwtf_tpu.ops.suffix import suffix_array_ints_np
from pfbwtf_tpu.parallel.dsort import (
    dense_ranks,
    dist_gather,
    distributed_doubling,
    dsort_blocks,
    route_to_slots,
)
from pfbwtf_tpu.parallel.sharded import make_parse_mesh


def _blocks(arr, n_dev, fill):
    n = arr.shape[0]
    W = -(-max(n, 64) // n_dev)
    W = -(-W // 64) * 64
    out = np.full(n_dev * W, fill, dtype=np.int64)
    out[:n] = arr
    return out.reshape(n_dev, W), W


@pytest.mark.parametrize("N", [10, 1000, 5000])
def test_dsort_blocks_sorts(rng, N):
    mesh = make_parse_mesh()
    n_dev = mesh.devices.size
    keys = rng.integers(0, 50, size=N)
    pos, W = _blocks(np.arange(N), n_dev, -1)
    kb, _ = _blocks(keys, n_dev, -1)
    sk, spos = dsort_blocks(mesh, "dp", kb.astype(np.uint64), pos)
    sk = np.asarray(sk).reshape(-1)
    spos = np.asarray(spos).reshape(-1)
    valid = spos >= 0
    assert valid.sum() == N
    got_keys = sk[valid].astype(np.int64)
    got_pos = spos[valid]
    order = np.lexsort((np.arange(N), keys))  # stable
    assert np.array_equal(got_keys, keys[order])
    assert np.array_equal(got_pos, order)


def test_dense_ranks(rng):
    mesh = make_parse_mesh()
    n_dev = mesh.devices.size
    N = 3000
    keys = np.sort(rng.integers(0, 40, size=N))
    pos, W = _blocks(np.arange(N), n_dev, -1)
    kb, _ = _blocks(keys, n_dev, -1)
    # feed already-sorted keys in block-major order
    gid = np.asarray(dense_ranks(mesh, "dp", kb.astype(np.uint64)))
    gid = gid.reshape(-1)[:N]
    want = np.unique(keys, return_inverse=True)[1]
    assert np.array_equal(gid, want)


def test_route_to_slots(rng):
    mesh = make_parse_mesh()
    n_dev = mesh.devices.size
    N = 2000
    perm = rng.permutation(N)
    vals = rng.integers(0, 10**9, size=N)
    pb, W = _blocks(perm, n_dev, -1)
    vb, _ = _blocks(vals, n_dev, -1)
    out = np.asarray(route_to_slots(mesh, "dp", pb, vb, W)).reshape(-1)
    want = np.zeros(out.shape[0], dtype=np.int64)
    want[perm] = vals
    assert np.array_equal(out, want)


def test_dist_gather(rng):
    mesh = make_parse_mesh()
    n_dev = mesh.devices.size
    N = 1500
    table = rng.integers(0, 10**9, size=N)
    tb, W = _blocks(table, n_dev, 0)
    M = 900
    idx = rng.integers(0, N, size=M)
    ib, _ = _blocks(idx, n_dev, -1)
    tagb, _ = _blocks(np.arange(M), n_dev, -1)
    out = np.asarray(
        dist_gather(mesh, "dp", tb, ib, tagb, W, ib.shape[1])
    ).reshape(-1)[:M]
    assert np.array_equal(out, table[idx])


@pytest.mark.parametrize("N,card", [(500, 4), (4000, 100), (257, 2)])
def test_distributed_doubling_matches_host(rng, N, card):
    mesh = make_parse_mesh()
    seq = rng.integers(1, card + 1, size=N).astype(np.int64)
    seq[-1] = 0  # unique minimum terminator
    got = distributed_doubling(seq, mesh)
    want = suffix_array_ints_np(seq)
    assert np.array_equal(got, want)
