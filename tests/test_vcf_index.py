"""Indexed VCF access: .csi/.tbi contig seek (vcf/index.py).

The reference ships .csi indexes next to its fixtures and iterates per
contig via bcf_sr_seek (vcf_scanner.hpp:156-206); these tests decode the
reference's own committed indexes and check that an index-seek restricted
parse equals the full sequential parse restricted post-hoc.
"""

import gzip
import os
import struct

import numpy as np
import pytest

from pfbwtf_tpu.vcf import index as vidx
from pfbwtf_tpu.vcf.reader import VCF, merge_vcfs

DATA = "/root/reference/tests/data"
MULT = f"{DATA}/mult_chroms.vcf.gz"


def test_load_reference_csi():
    idx = vidx.load_index(MULT + ".csi")
    full = VCF(MULT)
    # every contig with records has an offset; offsets increase in file
    # order for a position-sorted VCF
    offs = [idx[c] for c in full.contigs if c in idx]
    assert len(offs) >= 2
    assert offs == sorted(offs)
    assert all(o > 0 for o in offs)


def test_indexed_parse_equals_sequential():
    full = VCF(MULT)
    target = full.contigs[1]  # not the first: forces a real seek
    sub = VCF(MULT, contigs=[target])
    assert sub.contigs == [target]
    ra, rb = full.records_for_contig(target), sub.records_for_contig(target)
    assert len(ra) == len(rb) and len(ra) > 0
    for x, y in zip(ra, rb):
        assert (x.pos, x.vid, x.alleles, x.filter, x.info) == (
            y.pos, y.vid, y.alleles, y.filter, y.info
        )
        assert np.array_equal(x.gts._row, y.gts._row)
    # non-requested contigs are absent
    assert len(sub.records_for_contig(full.contigs[0])) == 0


def _gz_member(data: bytes) -> bytes:
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()


def _write_csi(path: str, offsets: dict):
    """Minimal tabix-flavored CSI: one bin with one chunk per contig."""
    names = b"".join(n.encode() + b"\x00" for n in offsets)
    aux = struct.pack("<6i", 2, 1, 2, 0, ord("#"), 0)
    aux += struct.pack("<i", len(names)) + names
    body = b"CSI\x01" + struct.pack("<3i", 14, 5, len(aux)) + aux
    body += struct.pack("<i", len(offsets))
    for vo in offsets.values():
        body += struct.pack("<i", 1)  # n_bin
        body += struct.pack("<IQ", 4681, vo)  # bin id, loff
        body += struct.pack("<i", 1)  # n_chunk
        body += struct.pack("<QQ", vo, vo + (1 << 32))
    with open(path, "wb") as f:
        f.write(_gz_member(body))


def _make_multiblock_vcf(tmp_path):
    """bgzip-style VCF: header + each contig in its OWN gzip member, so
    contig seeks have nonzero compressed offsets."""
    header = (
        b"##fileformat=VCFv4.2\n"
        + b"".join(
            b"##contig=<ID=c%d,length=1000>\n" % i for i in range(3)
        )
        + b'##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
        + b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
    )
    rng = np.random.default_rng(3)
    sections = []
    for i in range(3):
        lines = b"".join(
            b"c%d\t%d\tv%d_%d\tA\tG\t50\tPASS\tDP=%d\tGT\t0|1\n"
            % (i, p, i, j, 5 + j)
            for j, p in enumerate(
                sorted(rng.choice(np.arange(1, 900), 40, replace=False))
            )
        )
        sections.append((f"c{i}", lines))
    path = str(tmp_path / "mb.vcf.gz")
    offsets = {}
    with open(path, "wb") as f:
        f.write(_gz_member(header))
        for contig, data in sections:
            offsets[contig] = f.tell() << 16
            f.write(_gz_member(data))
    _write_csi(path + ".csi", offsets)
    return path


def test_indexed_seek_skips_file_head(tmp_path):
    """The restricted parse must START decompression at the indexed
    offset: corrupt the compressed bytes of an earlier contig's block and
    confirm the restricted parse still succeeds (a sequential scan would
    crash on the damaged member)."""
    path = _make_multiblock_vcf(tmp_path)
    idx = vidx.load_index(path + ".csi")
    assert idx["c2"] >> 16 > 0
    full = VCF(path)
    want = [r.pos for r in full.records_for_contig("c2")]
    assert len(want) == 40
    # break c1's gzip member (between c0's offset and c2's offset)
    raw = bytearray(open(path, "rb").read())
    hurt = ((idx["c1"] >> 16) + (idx["c2"] >> 16)) // 2
    raw[hurt] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(Exception):
        VCF(path)  # sequential scan hits the damaged block
    sub = VCF(path, contigs=["c2"])  # index seek jumps over it
    assert [r.pos for r in sub.records_for_contig("c2")] == want


def test_merge_vcfs_contig_restriction():
    full = merge_vcfs([MULT])
    target = full.contigs[0]
    sub = merge_vcfs([MULT], contigs=[target])
    assert sub.contigs == [target]
    assert len(sub.records_for_contig(target)) == len(
        full.records_for_contig(target)
    )


def test_restrict_without_index_falls_back(tmp_path):
    """Plain-gzip (or indexless) files still honor contigs= by filtering
    the sequential parse."""
    full = VCF(MULT)
    target = full.contigs[1]
    plain = str(tmp_path / "x.vcf")
    with gzip.open(MULT, "rb") as f, open(plain, "wb") as o:
        o.write(f.read())
    sub = VCF(plain, contigs=[target])
    assert sub.contigs == [target]
    assert len(sub.records_for_contig(target)) == len(
        full.records_for_contig(target)
    )
