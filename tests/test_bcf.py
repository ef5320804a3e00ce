"""BCF2 decode path of vcf/reader.py.

The encoder below is written directly from the VCFv4.x spec section 6
(typed values, shared/indiv record blocks, header dictionaries) so the
test is text-parse vs binary-parse equivalence of the SAME logical data —
the two decoders share no code path below the columnar store."""

import gzip
import struct

import numpy as np
import pytest

from pfbwtf_tpu.vcf.reader import VCF

from .ref_fixtures import tmp_prefix
from .vcf_gen import random_vcf


def _typed(t: int, cnt: int) -> bytes:
    if cnt < 15:
        return bytes([(cnt << 4) | t])
    return bytes([(15 << 4) | t]) + _typed(3, 1) + struct.pack("<i", cnt)


def _typed_str(s: bytes) -> bytes:
    return _typed(7, len(s)) + s


def _typed_i8vec(vals) -> bytes:
    return _typed(1, len(vals)) + struct.pack(f"<{len(vals)}b", *vals)


def vcf_text_to_bcf(vcf_path: str, bcf_path: str):
    """Minimal spec-driven VCF->BCF2.2 encoder (GT only, int8 genotypes)."""
    with open(vcf_path, "rb") as f:
        lines = f.read().split(b"\n")
    header_lines = [ln for ln in lines if ln.startswith(b"#")]
    # BCF string dictionary: implicit PASS=0, then FILTER/INFO/FORMAT ids
    str_ids = [b"PASS"]
    contigs = []
    for ln in header_lines:
        if ln.startswith((b"##FILTER=", b"##INFO=", b"##FORMAT=")):
            inner = ln[ln.index(b"<") + 1 :].rstrip(b">")
            for kv in inner.split(b","):
                if kv.startswith(b"ID=") and kv[3:] not in str_ids:
                    str_ids.append(kv[3:])
        elif ln.startswith(b"##contig="):
            inner = ln[ln.index(b"<") + 1 :].rstrip(b">")
            for kv in inner.split(b","):
                if kv.startswith(b"ID="):
                    contigs.append(kv[3:].decode())
    gt_key = str_ids.index(b"GT")
    header_text = b"\n".join(header_lines) + b"\n\x00"

    out = bytearray()
    out += b"BCF\x02\x02"
    out += struct.pack("<I", len(header_text))
    out += header_text

    for ln in lines:
        if not ln or ln.startswith(b"#"):
            continue
        cols = ln.split(b"\t")
        chrom = contigs.index(cols[0].decode())
        pos = int(cols[1]) - 1
        vid = cols[2]
        ref = cols[3]
        alts = [a for a in cols[4].split(b",") if a not in (b"", b".")]
        alleles = [ref] + alts
        try:
            qual_b = struct.pack("<f", float(cols[5]))
        except ValueError:
            qual_b = struct.pack("<I", 0x7F800001)
        filt = (
            []
            if cols[6] in (b".", b"")
            else [str_ids.index(f) for f in cols[6].split(b";")]
        )
        gts = []
        for s in cols[9:]:
            gt = s.split(b":")[0]
            hap = []
            for tok in gt.replace(b"|", b"/").split(b"/"):
                hap.append(-1 if tok == b"." else int(tok))
            gts.append(hap)
        ploidy = max(len(h) for h in gts)
        n_sample = len(gts)

        shared = bytearray()
        shared += struct.pack(
            "<iii", chrom, pos, max(len(a) for a in alleles)
        )
        shared += qual_b
        shared += struct.pack("<I", (len(alleles) << 16) | 0)  # n_info=0
        shared += struct.pack("<I", (1 << 24) | n_sample)  # n_fmt=1
        shared += _typed_str(vid)
        for a in alleles:
            shared += _typed_str(a)
        shared += _typed_i8vec(filt)

        indiv = bytearray()
        indiv += _typed_i8vec([gt_key])
        indiv += _typed(1, ploidy)
        for h in gts:
            enc = [0 if v < 0 else ((v + 1) << 1) for v in h]
            enc += [-0x7F] * (ploidy - len(enc))  # END_OF_VECTOR pad
            indiv += struct.pack(f"<{ploidy}b", *enc)

        out += struct.pack("<II", len(shared), len(indiv))
        out += shared
        out += indiv

    with gzip.open(bcf_path, "wb") as f:
        f.write(bytes(out))


@pytest.fixture(scope="module")
def paired_files():
    rng = np.random.default_rng(5)
    seq1 = bytes(rng.choice(list(b"ACGT"), size=400).astype(np.uint8))
    seq2 = bytes(rng.choice(list(b"ACGT"), size=300).astype(np.uint8))
    prefix = tmp_prefix("bcf")
    vcf_path = prefix + ".vcf"
    bcf_path = prefix + ".bcf"
    random_vcf(
        vcf_path, [("c1", seq1), ("c2", seq2)], rng, nsamples=3,
        density=0.05, indel_frac=0.3,
    )
    vcf_text_to_bcf(vcf_path, bcf_path)
    return vcf_path, bcf_path


def test_bcf_equals_text_parse(paired_files):
    vcf_path, bcf_path = paired_files
    a = VCF(vcf_path)
    b = VCF(bcf_path)
    assert a.contigs == b.contigs
    assert a.samples == b.samples
    for c in a.contigs:
        ra, rb = a.records_for_contig(c), b.records_for_contig(c)
        assert len(ra) == len(rb)
        for x, y in zip(ra, rb):
            assert (x.contig, x.pos, x.vid, x.alleles) == (
                y.contig, y.pos, y.vid, y.alleles
            )
            assert x.filter == y.filter
            assert np.array_equal(x.gts._row, y.gts._row)
            assert (np.isnan(x.qual) and np.isnan(y.qual)) or (
                abs(x.qual - y.qual) < 1e-5
            )


def test_bcf_haploid_and_missing_gt():
    """Haploid GT duplicates (vcf_scanner.hpp:34-36); '.' -> (-1,-1)."""
    prefix = tmp_prefix("bcfh")
    vcf_path, bcf_path = prefix + ".vcf", prefix + ".bcf"
    with open(vcf_path, "wb") as f:
        f.write(
            b"##fileformat=VCFv4.2\n"
            b"##contig=<ID=cX,length=50>\n"
            b'##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1\n"
            b"cX\t5\tv1\tA\tG\t.\t.\t.\tGT\t1\t0/1\n"
            b"cX\t9\tv2\tC\tT\t.\t.\t.\tGT\t.\t1|1\n"
        )
    vcf_text_to_bcf(vcf_path, bcf_path)
    for path in (vcf_path, bcf_path):
        v = VCF(path)
        r = v.records_for_contig("cX")
        assert list(r[0].gts[0]) == [1, 1]  # haploid duplicated
        assert list(r[0].gts[1]) == [0, 1]
        assert list(r[1].gts[0]) == [-1, -1]  # missing
        assert list(r[1].gts[1]) == [1, 1]


def test_vcf_to_bwt_accepts_bcf(tmp_path):
    """The orchestrator runs end-to-end from a .bcf input and matches the
    .vcf run byte-for-byte."""
    from pfbwtf_tpu.vcf.pipeline import VcfToBwtConfig, vcf_to_bwt

    rng = np.random.default_rng(11)
    seq = bytes(rng.choice(list(b"ACGT"), size=500).astype(np.uint8))
    fa = tmp_path / "ref.fa"
    fa.write_bytes(b">c1\n" + seq + b"\n")
    vcf_path = str(tmp_path / "x.vcf")
    bcf_path = str(tmp_path / "x.bcf")
    random_vcf(vcf_path, [("c1", seq)], rng, nsamples=2, density=0.03)
    vcf_text_to_bcf(vcf_path, bcf_path)

    outs = []
    for tag, vpath in (("v", vcf_path), ("b", bcf_path)):
        o = str(tmp_path / tag)
        vcf_to_bwt(
            VcfToBwtConfig(
                fasta=str(fa), vcfs=[vpath], output=o, sa=True,
                wsize=4, mod=10,
            )
        )
        outs.append(o)
    for ext in (".bwt", ".sa"):
        assert (
            open(outs[0] + ext, "rb").read() == open(outs[1] + ext, "rb").read()
        )


def test_merge_vcfs_mixed_formats(tmp_path):
    """A .vcf and a .bcf (disjoint samples, same contig) merge identically
    to merging the two text VCFs."""
    from pfbwtf_tpu.vcf.reader import merge_vcfs

    rng = np.random.default_rng(17)
    seq = bytes(rng.choice(list(b"ACGT"), size=300).astype(np.uint8))
    v1, v2 = str(tmp_path / "a.vcf"), str(tmp_path / "b.vcf")
    b2 = str(tmp_path / "b.bcf")
    random_vcf(v1, [("c1", seq)], rng, nsamples=1, density=0.03)
    # second file: different sample name (rewrite the header's sample col)
    random_vcf(v2, [("c1", seq)], rng, nsamples=1, density=0.04)
    text = open(v2, "rb").read().replace(b"\ts0\n", b"\tzz\n")
    open(v2, "wb").write(text)
    vcf_text_to_bcf(v2, b2)

    m_text = merge_vcfs([v1, v2])
    m_mixed = merge_vcfs([v1, b2])
    assert m_text.samples == m_mixed.samples
    for c in m_text.contigs:
        ra, rb = m_text.records_for_contig(c), m_mixed.records_for_contig(c)
        assert len(ra) == len(rb)
        for x, y in zip(ra, rb):
            assert (x.pos, x.alleles) == (y.pos, y.alleles)
            assert np.array_equal(x.gts._row, y.gts._row)


def test_bcf_repeated_id_across_sections():
    """An ID repeated across INFO and FORMAT without IDX= shares ONE
    dictionary index (htslib bcf_hdr semantics): DP in both sections must
    not shift GT's implicit index, or genotypes silently decode missing."""
    prefix = tmp_prefix("bcfdup")
    vcf_path, bcf_path = prefix + ".vcf", prefix + ".bcf"
    with open(vcf_path, "wb") as f:
        f.write(
            b"##fileformat=VCFv4.2\n"
            b"##contig=<ID=cY,length=50>\n"
            b'##FILTER=<ID=q10,Description="Q">\n'
            b'##INFO=<ID=DP,Number=1,Type=Integer,Description="D">\n'
            b'##FORMAT=<ID=DP,Number=1,Type=Integer,Description="D">\n'
            b'##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
            b"cY\t5\tv1\tA\tG\t.\tq10\t.\tGT\t1|0\n"
            b"cY\t9\tv2\tC\tT\t.\t.\t.\tGT\t0/1\n"
        )
    vcf_text_to_bcf(vcf_path, bcf_path)
    v = VCF(bcf_path)
    r = v.records_for_contig("cY")
    assert list(r[0].gts[0]) == [1, 0]
    assert list(r[1].gts[0]) == [0, 1]
    assert r[0].filter == "q10"
