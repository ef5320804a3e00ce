"""FASTA input (kseq.h-equivalent semantics) and a samtools-faidx equivalent.

The reference streams FASTA through kseq over zlib (pfparser.hpp:299-369).
Here we slurp + vectorize: headers located with numpy, sequence bytes
compacted with boolean masks — O(bytes) with no per-char Python loop, which
keeps host-side prep off the critical path before the device hash-scan.

Record semantics match kseq: name = header text up to first whitespace,
sequence = all non-whitespace bytes until the next '>' header.
"""

import gzip
import io
import os
import sys
from typing import List, Tuple

import numpy as np


def _read_all(fname: str) -> bytes:
    if fname == "-":
        data = sys.stdin.buffer.read()
    else:
        with open(fname, "rb") as f:
            data = f.read()
    # gzip (incl. bgzip = concatenated gzip members)
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data


def read_fasta_bytes(fname: str) -> List[Tuple[str, np.ndarray]]:
    """Returns [(name, seq_bytes_u8)] per record."""
    data = _read_all(fname)
    if not data:
        return []
    buf = np.frombuffer(data, dtype=np.uint8)
    nl = ord("\n")
    gt = ord(">")
    # line starts = position 0 plus positions after each newline
    newline_pos = np.flatnonzero(buf == nl)
    line_starts = np.concatenate(([0], newline_pos + 1))
    line_starts = line_starts[line_starts < buf.size]
    header_starts = line_starts[buf[line_starts] == gt]
    if header_starts.size == 0:
        raise ValueError(f"{fname}: not FASTA (no '>' header)")
    # header line ends
    line_ends = np.searchsorted(newline_pos, header_starts)
    header_ends = np.where(
        line_ends < newline_pos.size, newline_pos[line_ends], buf.size
    )
    records = []
    # whitespace mask computed once for the whole buffer
    ws = (buf == nl) | (buf == ord("\r")) | (buf == ord(" ")) | (buf == ord("\t"))
    bounds = np.concatenate((header_starts, [buf.size]))
    for i in range(header_starts.size):
        hs, he = header_starts[i], header_ends[i]
        header = data[hs + 1 : he].decode("ascii", "replace")
        name = header.split()[0] if header.split() else ""
        seq_lo, seq_hi = he + 1 if he < buf.size else buf.size, bounds[i + 1]
        chunk = buf[seq_lo:seq_hi]
        seq = chunk[~ws[seq_lo:seq_hi]]
        records.append((name, np.ascontiguousarray(seq)))
    return records


def read_fasta(fname: str) -> List[Tuple[str, bytes]]:
    return [(n, s.tobytes()) for n, s in read_fasta_bytes(fname)]


def iter_fasta_records(fname: str, block: int = 8 << 20):
    """Streaming record iterator: yields (name, seq_u8) one record at a
    time, reading the file in ``block``-byte pieces — only the current
    record is resident (the kseq-equivalent path for inputs larger than
    RAM).  Same record semantics as read_fasta_bytes."""
    if fname == "-":
        fh = sys.stdin.buffer
        close = False
    else:
        fh = open(fname, "rb")
        close = True
        magic = fh.read(2)
        fh.seek(0)
        if magic == b"\x1f\x8b":
            fh = gzip.open(fh, "rb")
    try:
        name = None
        parts: List[np.ndarray] = []
        carry = b""
        while True:
            data = fh.read(block)
            if not data:
                break
            data = carry + data
            # keep a partial trailing line in `carry` so headers and the
            # whitespace mask never straddle block boundaries
            cutpos = data.rfind(b"\n")
            if cutpos < 0:
                carry = data
                continue
            carry = data[cutpos + 1:]
            data = data[: cutpos + 1]
            for line in data.split(b"\n"):
                if not line:
                    continue
                if line.startswith(b">"):
                    if name is not None:
                        yield name, _cat_seq(parts)
                    header = line[1:].decode("ascii", "replace").strip()
                    name = header.split()[0] if header.split() else ""
                    parts = []
                elif name is not None:
                    parts.append(_seq_line(line))
                else:
                    raise ValueError(f"{fname}: not FASTA (no '>' header)")
        if carry:
            line = carry
            if line.startswith(b">"):
                if name is not None:
                    yield name, _cat_seq(parts)
                header = line[1:].decode("ascii", "replace").strip()
                name = header.split()[0] if header.split() else ""
                parts = []
            elif name is not None:
                parts.append(_seq_line(line))
            else:
                raise ValueError(f"{fname}: not FASTA (no '>' header)")
        if name is None:
            raise ValueError(f"{fname}: not FASTA (no '>' header)")
        yield name, _cat_seq(parts)
    finally:
        if close:
            fh.close()


def _seq_line(line: bytes) -> np.ndarray:
    """Strip ALL whitespace from a sequence line (read_fasta_bytes
    semantics, not just edges)."""
    arr = np.frombuffer(line, dtype=np.uint8)
    ws = (arr == 32) | (arr == 9) | (arr == 13) | (arr == 10)
    return arr[~ws] if ws.any() else arr


def _cat_seq(parts: List[np.ndarray]) -> np.ndarray:
    if not parts:
        return np.zeros(0, dtype=np.uint8)
    return np.ascontiguousarray(np.concatenate(parts))


# -- faidx -------------------------------------------------------------------

def write_fai(fasta_fname: str, fai_fname: str = None) -> str:
    """samtools-faidx-compatible index: name len offset linebases linewidth."""
    fai_fname = fai_fname or fasta_fname + ".fai"
    rows = []
    with open(fasta_fname, "rb") as f:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        first_line = True
        pos = 0
        for raw in f:
            line = raw.rstrip(b"\r\n")
            if raw.startswith(b">"):
                if name is not None:
                    rows.append((name, length, offset, linebases, linewidth))
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                length = 0
                offset = pos + len(raw)
                first_line = True
            elif name is not None and line:
                if first_line:
                    linebases = len(line)
                    linewidth = len(raw)
                    first_line = False
                length += len(line)
            pos += len(raw)
        if name is not None:
            rows.append((name, length, offset, linebases, linewidth))
    with open(fai_fname, "w") as f:
        for r in rows:
            f.write("{}\t{}\t{}\t{}\t{}\n".format(*r))
    return fai_fname


def read_fai(fai_fname: str):
    idx = {}
    order = []
    with open(fai_fname) as f:
        for line in f:
            parts = line.split("\t")
            if len(parts) < 5:
                continue
            name = parts[0]
            idx[name] = tuple(int(x) for x in parts[1:5])
            order.append(name)
    return idx, order


def fetch_contig(fasta_fname: str, contig: str) -> bytes:
    """fai_fetch equivalent: contig sequence with newlines stripped."""
    fai = fasta_fname + ".fai"
    if not os.path.exists(fai):
        write_fai(fasta_fname)
    idx, _ = read_fai(fai)
    if contig not in idx:
        raise KeyError(f"contig {contig!r} not in {fasta_fname}")
    length, offset, linebases, linewidth = idx[contig]
    nlines = (length + linebases - 1) // linebases if linebases else 0
    nbytes = length + nlines * (linewidth - linebases)
    with open(fasta_fname, "rb") as f:
        f.seek(offset)
        raw = f.read(nbytes)
    return raw.replace(b"\n", b"").replace(b"\r", b"")[:length]
