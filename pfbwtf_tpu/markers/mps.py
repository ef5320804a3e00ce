"""Marker-positions (.mps) streams.

File format (marker_array.hpp:100-121): repeated uint64 runs
``start end marker... 0xFFFFFFFFFFFFFFFF`` where [start, end] is an
inclusive text-position range and the markers are bit-packed MarkerT values.

``MarkerPositionsWriter`` reproduces the reference's windowed coalescing
writer (marker_array.hpp:31-132): each marker covers the ``wsize`` text
positions ending at its textpos; adjacent positions with identical marker
lists coalesce into one run.  (Note the reference's own vcf_scan call site
does not compile at this revision — marker_array.hpp:64 vs vcf_scan.cpp:216
— so the behavioral spec here is the committed truth outputs, per
SURVEY.md §7 "hard parts" item 6.)
"""

from typing import List, Tuple

import numpy as np

from .marker import DELIM, create_marker


class MarkerPositionsWriter:
    def __init__(self, wsize: int, fp):
        self.wsize = int(wsize)
        self.fp = fp
        self.seqid = -1
        self.tpos = 0
        self.queue: List[Tuple[int, int, int, int]] = []  # (textpos, refpos, gt, seqid)
        self.pending_markers: List[int] = []
        self.range = [0, 0]

    def update(self, pos: int, recpos: int, gt: int, seqid: int):
        if seqid == -1:
            raise ValueError("seqid==-1 not allowed")
        if self.seqid != -1 and self.seqid != seqid:
            raise RuntimeError("sequence changed without finish_sequence()")
        while self.queue and self.queue[0][0] + self.wsize <= pos:
            self._process_run()
            self.queue.pop(0)
        self.queue.append((pos, recpos, gt, seqid))
        self.seqid = seqid

    def finish_sequence(self):
        if self.queue:
            self._process_run()
        self.queue.clear()
        if self.pending_markers:
            self._emit(self.range[0], self.range[1], self.pending_markers)
        self.pending_markers = []
        self.range = [0, 0]
        self.seqid = -1

    def _process_run(self):
        front = self.queue[0][0]
        if self.tpos + self.wsize <= front:
            self.tpos = front - self.wsize + 1
        for i, m in enumerate(self.queue):
            if not (self.tpos + self.wsize > m[0]):
                end = m[0] - self.wsize
                self._write_markers(self.tpos, end, i)
                self.tpos = end + 1
        self._write_markers(self.tpos, front, len(self.queue))
        self.tpos = front + 1

    def _write_markers(self, start: int, end: int, count: int):
        markers: List[int] = []
        px = None
        for textpos, refpos, gt, seqid in self.queue[:count]:
            x = int(create_marker(refpos, gt, seqid))
            if x != px:
                markers.append(x)
            px = x
        if start == self.range[1] + 1 and markers == self.pending_markers:
            self.range[1] = end
        else:
            if self.pending_markers:
                self._emit(self.range[0], self.range[1], self.pending_markers)
            self.range = [start, end]
            self.pending_markers = markers

    def _emit(self, start: int, end: int, markers: List[int]):
        arr = np.empty(len(markers) + 3, dtype=np.uint64)
        arr[0] = start
        arr[1] = end
        arr[2 : 2 + len(markers)] = markers
        arr[-1] = DELIM
        self.fp.write(arr.tobytes())


def read_mps_runs(path_or_bytes):
    """Parse a .mps/.ma stream into (starts, ends, marker lists)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        raw = open(path_or_bytes, "rb").read()
    vals = np.frombuffer(raw, dtype=np.uint64)
    starts, ends, markers = [], [], []
    i = 0
    delim = int(DELIM)
    n = vals.shape[0]
    delim_pos = np.flatnonzero(vals == delim)
    prev = 0
    for d in delim_pos:
        run = vals[prev:d]
        if run.shape[0] >= 2:
            starts.append(int(run[0]))
            ends.append(int(run[1]))
            markers.append(run[2:].copy())
        prev = d + 1
    return (
        np.array(starts, dtype=np.uint64),
        np.array(ends, dtype=np.uint64),
        markers,
    )


def write_mps_runs(fp, starts, ends, markers):
    for s, e, ms in zip(starts, ends, markers):
        arr = np.empty(len(ms) + 3, dtype=np.uint64)
        arr[0] = s
        arr[1] = e
        arr[2 : 2 + len(ms)] = ms
        arr[-1] = DELIM
        fp.write(arr.tobytes())


def merge_mps(output: str, prefixes: List[str]):
    """merge_mps CLI equivalent (src/merge_mps.cpp:28-84): concatenate
    per-haplotype .mps streams, offsetting run keys by the cumulative text
    length read from each prefix's .n file."""
    from ..io.formats import read_n

    with open(output, "wb") as ofp:
        seq_bias = 0
        for prefix in prefixes:
            starts, ends, markers = read_mps_runs(prefix + ".mps")
            length = read_n(prefix + ".n")
            write_mps_runs(
                ofp,
                (starts.astype(np.int64) + seq_bias).astype(np.uint64),
                (ends.astype(np.int64) + seq_bias).astype(np.uint64),
                markers,
            )
            seq_bias += length
