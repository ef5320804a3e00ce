"""Marker subsystem unit tests.

The bit-packing cases mirror the reference's GoogleTest suite
(tests/marker_test.cpp:5-81), including the overflow-truncation behavior.
"""

import os
import io

import numpy as np
import pytest

from pfbwtf_tpu.markers import (
    DELIM,
    MarkerPositionsWriter,
    RleWindowArray,
    create_marker,
    get_allele,
    get_pos,
    get_seq,
    set_allele,
    set_pos,
    set_seq,
)
from pfbwtf_tpu.markers.mps import read_mps_runs, write_mps_runs
from pfbwtf_tpu.markers.ma import marker_array_from_sa


# -- bit packing (marker_test.cpp parity) ------------------------------------

def test_set_and_get_pos():
    assert get_pos(set_pos(0, 100)) == 100


def test_pos_overflow_truncates():
    assert get_pos(set_pos(0, 0x0010000000000000)) == 0


def test_set_and_get_seq():
    assert get_seq(set_seq(0, 52)) == 52


def test_seq_overflow_truncates():
    assert get_seq(set_seq(0, 0x10000)) == 0


def test_set_and_get_allele():
    assert get_allele(set_allele(0, 1)) == 1


def test_allele_overflow_truncates():
    assert get_allele(set_allele(0, 0x10)) == 0


def test_combined_marker():
    x = set_pos(0, 2839742)
    x = set_seq(x, 52)
    x = set_allele(x, 1)
    assert get_pos(x) == 2839742
    assert get_seq(x) == 52
    assert get_allele(x) == 1


def test_create_marker_roundtrip():
    m = create_marker(12345, 3, 7)
    assert get_pos(m) == 12345
    assert get_allele(m) == 3
    assert get_seq(m) == 7


def test_vectorized_pack():
    pos = np.array([0, 1, 2**44 - 1], dtype=np.uint64)
    m = create_marker(pos, 1, 2)
    assert np.array_equal(get_pos(m), pos)
    assert np.all(get_allele(m) == 1)
    assert np.all(get_seq(m) == 2)


# -- mps writer / reader -----------------------------------------------------

def _collect(writer_calls, wsize=1):
    buf = io.BytesIO()
    w = MarkerPositionsWriter(wsize, buf)
    for call in writer_calls:
        if call == "finish":
            w.finish_sequence()
        else:
            w.update(*call)
    return read_mps_runs(buf.getvalue())


def test_mps_single_marker():
    starts, ends, markers = _collect([(5, 100, 1, 0), "finish"])
    assert starts.tolist() == [5]
    assert ends.tolist() == [5]
    assert markers[0].tolist() == [int(create_marker(100, 1, 0))]


def test_mps_run_coalescing():
    # consecutive positions with the same marker list coalesce into one run
    calls = [(i, 100, 1, 0) for i in range(5, 10)] + ["finish"]
    starts, ends, markers = _collect(calls)
    assert starts.tolist() == [5]
    assert ends.tolist() == [9]


def test_mps_distinct_markers_split_runs():
    calls = [(5, 100, 1, 0), (6, 200, 1, 0), "finish"]
    starts, ends, markers = _collect(calls)
    assert starts.tolist() == [5, 6]
    assert ends.tolist() == [5, 6]
    assert markers[0].tolist() == [int(create_marker(100, 1, 0))]
    assert markers[1].tolist() == [int(create_marker(200, 1, 0))]


def test_mps_window_covers_w_positions():
    # wsize=3: a marker at textpos 10 covers positions 8..10
    starts, ends, markers = _collect([(10, 77, 2, 0), "finish"], wsize=3)
    assert starts.tolist() == [8]
    assert ends.tolist() == [10]


def test_mps_roundtrip():
    buf = io.BytesIO()
    s = np.array([1, 10], dtype=np.uint64)
    e = np.array([3, 12], dtype=np.uint64)
    ms = [np.array([7], np.uint64), np.array([8, 9], np.uint64)]
    write_mps_runs(buf, s, e, ms)
    s2, e2, ms2 = read_mps_runs(buf.getvalue())
    assert np.array_equal(s, s2) and np.array_equal(e, e2)
    assert [m.tolist() for m in ms] == [m.tolist() for m in ms2]


# -- rle window + SA->MA -----------------------------------------------------

def _mps_bytes(starts, ends, markers):
    buf = io.BytesIO()
    write_mps_runs(buf, starts, ends, markers)
    return buf.getvalue()


def test_rle_window_at():
    data = _mps_bytes(
        np.array([2, 10], np.uint64),
        np.array([4, 12], np.uint64),
        [np.array([100], np.uint64), np.array([200], np.uint64)],
    )
    arr = RleWindowArray(data)
    assert arr.at(3).tolist() == [100]
    assert arr.at(5).tolist() == []
    assert arr.at(10).tolist() == [200]
    assert np.array_equal(arr.run_index(np.array([0, 2, 4, 5, 12, 99])),
                          np.array([-1, 0, 0, -1, 1, -1]))


def test_rle_window_at_range():
    data = _mps_bytes(
        np.array([2, 10], np.uint64),
        np.array([4, 12], np.uint64),
        [np.array([100], np.uint64), np.array([200], np.uint64)],
    )
    arr = RleWindowArray(data)
    assert arr.at_range(0, 20).tolist() == [100, 200]
    assert arr.at_range(5, 9).tolist() == []
    assert arr.at_range(4, 10).tolist() == [100, 200]


def test_marker_array_from_sa_coalesces_identical_lists():
    # two distinct source runs with the same marker payload, adjacent in SA
    # order, must coalesce (write_marker_array's vec_eq semantics)
    data = _mps_bytes(
        np.array([0, 5], np.uint64),
        np.array([1, 6], np.uint64),
        [np.array([42], np.uint64), np.array([42], np.uint64)],
    )
    arr = RleWindowArray(data)
    sa = np.array([0, 5, 3, 6, 1], dtype=np.uint64)
    starts, ends, markers = marker_array_from_sa(sa, arr)
    assert starts.tolist() == [0, 3]
    assert ends.tolist() == [1, 4]
    assert [m.tolist() for m in markers] == [[42], [42]]


def test_marker_array_from_sa_jax_matches_host(rng):
    """The device SA->MA permute (searchsorted + coalescing in HBM) must
    reproduce the host pass run-for-run."""
    from pfbwtf_tpu.markers.ma import marker_array_from_sa
    from pfbwtf_tpu.markers.ma_jax import marker_array_from_sa_jax

    # random non-overlapping runs with some shared marker content
    nruns = 40
    edges = np.sort(rng.choice(np.arange(1, 5000), size=2 * nruns,
                               replace=False))
    starts, ends = edges[0::2], edges[1::2]
    pool = [
        np.array([7], np.uint64),
        np.array([7, 9], np.uint64),
        np.array([11], np.uint64),
    ]
    markers = [pool[int(i)] for i in rng.integers(0, len(pool), nruns)]
    arr = RleWindowArray(_mps_bytes(starts, ends, markers))
    sa = rng.permutation(6000).astype(np.uint64)
    h = marker_array_from_sa(sa, arr)
    d = marker_array_from_sa_jax(sa, arr)
    assert np.array_equal(h[0], d[0])
    assert np.array_equal(h[1], d[1])
    assert len(h[2]) == len(d[2])
    for a, b in zip(h[2], d[2]):
        assert np.array_equal(a, b)


def test_write_marker_array_backend_jax(tmp_path, rng):
    from pfbwtf_tpu.markers.ma import write_marker_array

    starts = np.array([3, 20], np.uint64)
    ends = np.array([9, 30], np.uint64)
    markers = [np.array([5], np.uint64), np.array([5], np.uint64)]
    mps = tmp_path / "x.mps"
    mps.write_bytes(_mps_bytes(starts, ends, markers))
    sa = rng.permutation(50).astype(np.uint64)
    out_h = tmp_path / "h.ma"
    out_d = tmp_path / "d.ma"
    write_marker_array(str(mps), sa, str(out_h))
    write_marker_array(str(mps), sa, str(out_d), backend="jax")
    assert out_h.read_bytes() == out_d.read_bytes()


# -- batched .mps writer equivalence ------------------------------------------

def _stream_bytes(wsize, markers):
    import io

    from pfbwtf_tpu.markers.mps import MarkerPositionsWriter

    buf = io.BytesIO()
    w = MarkerPositionsWriter(wsize, buf)
    for pos, recpos, gt, seqid in markers:
        w.update(pos, recpos, gt, seqid)
    w.finish_sequence()
    return buf.getvalue()


def _batch_bytes(wsize, markers):
    import io

    from pfbwtf_tpu.markers.mps import BatchMarkerPositionsWriter

    buf = io.BytesIO()
    w = BatchMarkerPositionsWriter(wsize, buf)
    for pos, recpos, gt, seqid in markers:
        w.update(pos, recpos, gt, seqid)
    w.finish_sequence()
    return buf.getvalue()


def test_batch_mps_writer_matches_streaming_fuzz():
    rng = np.random.default_rng(99)
    for trial in range(40):
        wsize = int(rng.integers(1, 12))
        n = int(rng.integers(0, 60))
        # clustered nondecreasing positions to force window overlaps,
        # duplicates, and gaps; occasional repeated (recpos, gt) to force
        # equal-value dedup/coalescing paths
        pos = np.cumsum(rng.integers(0, wsize + 3, size=n))
        markers = []
        for i in range(n):
            recpos = int(rng.integers(0, 50))
            gt = int(rng.integers(0, 3))
            markers.append((int(pos[i]), recpos, gt, 0))
        assert _batch_bytes(wsize, markers) == _stream_bytes(wsize, markers), (
            f"trial {trial} wsize={wsize} markers={markers}"
        )


def test_batch_mps_writer_multi_sequence():
    import io

    from pfbwtf_tpu.markers.mps import (
        BatchMarkerPositionsWriter,
        MarkerPositionsWriter,
    )

    for cls_pair in [(MarkerPositionsWriter, BatchMarkerPositionsWriter)]:
        bufs = []
        for cls in cls_pair:
            buf = io.BytesIO()
            w = cls(4, buf)
            w.update(5, 100, 1, 0)
            w.update(7, 101, 2, 0)
            w.finish_sequence()
            w.update(3, 50, 0, 1)
            w.finish_sequence()
            bufs.append(buf.getvalue())
        assert bufs[0] == bufs[1]


def test_batch_mps_writer_multi_sequence_global_positions_fuzz():
    """Positions are global along the haplotype stream and tpos carries
    across finish_sequence (reference semantics); includes duplicate
    positions, which route through the streaming fallback."""
    import io

    from pfbwtf_tpu.markers.mps import (
        BatchMarkerPositionsWriter,
        MarkerPositionsWriter,
    )

    for trial in range(30):
        wsize = int(np.random.default_rng(1000 + trial).integers(1, 15))

        def run(cls):
            buf = io.BytesIO()
            w = cls(wsize, buf)
            p = 0
            rng2 = np.random.default_rng(trial)
            for seq in range(int(rng2.integers(1, 4))):
                for _ in range(int(rng2.integers(0, 25))):
                    lo = 0 if rng2.random() < 0.2 else 1
                    p += int(rng2.integers(lo, wsize + 3))
                    w.update(
                        p, int(rng2.integers(0, 60)),
                        int(rng2.integers(0, 3)), seq,
                    )
                w.finish_sequence()
            return buf.getvalue()

        assert run(MarkerPositionsWriter) == run(BatchMarkerPositionsWriter)


def test_rle_window_serialize_load_roundtrip(tmp_path):
    """Round-trip of the BUILT structure (rle_window_array.hpp:174-198):
    load must answer identically without re-reading .mps bytes."""
    data = _mps_bytes(
        np.array([2, 10, 30], np.uint64),
        np.array([4, 12, 31], np.uint64),
        [np.array([100], np.uint64),
         np.array([200, 300], np.uint64),
         np.zeros(0, np.uint64)],
    )
    arr = RleWindowArray(data)
    path = str(tmp_path / "x.rlwa")
    nbytes = arr.serialize(path)
    assert nbytes == os.path.getsize(path)
    back = RleWindowArray.load(path)
    assert np.array_equal(back.starts, arr.starts)
    assert np.array_equal(back.ends, arr.ends)
    assert len(back.markers) == len(arr.markers)
    for a, b in zip(arr.markers, back.markers):
        assert np.array_equal(np.asarray(a, np.uint64), b)
    q = np.array([0, 2, 4, 5, 11, 30, 99])
    assert np.array_equal(back.run_index(q), arr.run_index(q))
    assert back.at(11).tolist() == [200, 300]
    assert back.at_range(0, 40).tolist() == [100, 200, 300]
