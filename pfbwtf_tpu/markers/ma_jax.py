"""Device SA -> marker-array permute.

write_marker_array (marker_array.hpp:138-174) feeds every SA value through
rle_window_arr::at — a per-element rank/select query.  On device this is
one vectorized searchsorted over the run-start boundaries plus an
elementwise run-membership test and an adjacent-compare for run
coalescing; only the (few) coalesced run boundaries travel device->host,
so the pass fuses naturally onto the tail of the device BWT assembly
(ops/bwt_jax.py), whose SA values are already in HBM.
"""

from functools import partial

import numpy as np

from .rle_window import RleWindowArray


def _bucket(n: int, floor: int = 1 << 12) -> int:
    if n <= floor:
        return floor
    step = 1 << max(12, int(np.floor(np.log2(n))) - 3)
    return -(-n // step) * step


def _make_jits():
    import jax
    import jax.numpy as jnp

    def cid_of(sa, starts, ends, content):
        idx = jnp.searchsorted(starts, sa, side="right") - 1
        safe = jnp.clip(idx, 0, starts.shape[0] - 1)
        ok = (idx >= 0) & (sa <= ends[safe])
        cid = jnp.where(ok, content[safe], -1)
        boundary = jnp.concatenate(
            (jnp.ones(1, bool), cid[1:] != cid[:-1])
        )
        return idx, cid, boundary

    @jax.jit
    def count_boundaries(sa, starts, ends, content):
        _, _, b = cid_of(sa, starts, ends, content)
        return jnp.sum(b.astype(jnp.int64))

    @partial(jax.jit, static_argnames=("size",))
    def boundary_rows(sa, starts, ends, content, size):
        idx, cid, b = cid_of(sa, starts, ends, content)
        from ..ops.suffix import compact_indices_jax

        pos = compact_indices_jax(b, size, fill=-1).astype(jnp.int64)
        safe = jnp.clip(pos, 0, sa.shape[0] - 1)
        return pos, cid[safe], idx[safe]

    return count_boundaries, boundary_rows


_count_boundaries = None
_boundary_rows = None


def marker_array_from_sa_jax(sa_values, mai: RleWindowArray):
    """Device equivalent of ma.marker_array_from_sa: identical
    (starts, ends, markers) runs, with only run boundaries leaving HBM.

    ``sa_values`` may be a host array or an on-device SA (the fusion point
    with assemble_bwt_jax's sa_vals output).
    """
    global _count_boundaries, _boundary_rows
    import jax
    import jax.numpy as jnp

    if _count_boundaries is None:
        _count_boundaries, _boundary_rows = _make_jits()

    n = int(np.asarray(sa_values).shape[0]) if not hasattr(
        sa_values, "shape"
    ) else int(sa_values.shape[0])
    if n == 0 or not mai.starts.size:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64), []

    # pad the query stream to a bucketed size with a sentinel beyond every
    # run (cid -1); spurious boundaries at the pad junction are filtered by
    # position below
    nb = _bucket(n)
    sa_dev = jnp.asarray(sa_values, dtype=jnp.int64)
    if nb != n:
        sa_dev = jnp.concatenate(
            (sa_dev, jnp.full(nb - n, np.int64(2**62), dtype=jnp.int64))
        )
    starts = jnp.asarray(mai.starts)
    ends = jnp.asarray(mai.ends)
    content = jnp.asarray(mai.content_ids())

    count = int(np.asarray(_count_boundaries(sa_dev, starts, ends, content)))
    size = 1 << max(8, int(np.ceil(np.log2(max(count, 1)))))
    pos, cid, ridx = (
        np.asarray(a)
        for a in _boundary_rows(sa_dev, starts, ends, content, size)
    )
    keep = (pos >= 0) & (pos < n)
    pos, cid, ridx = pos[keep], cid[keep], ridx[keep]
    run_ends = np.concatenate((pos[1:] - 1, [n - 1]))
    sel = cid >= 0
    starts_out = pos[sel].astype(np.uint64)
    ends_out = run_ends[sel].astype(np.uint64)
    markers = [
        np.asarray(mai.markers[int(r)], dtype=np.uint64) for r in ridx[sel]
    ]
    return starts_out, ends_out, markers
