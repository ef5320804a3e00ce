"""htslib-grade VCF edge surface: symbolic ALTs, breakends, spanning '*'
alleles, half-calls and missing genotypes.

The reference inherits these record shapes from htslib
(vcf_scanner.hpp:9-13); real 1000G-derived panels contain them.  Contract
(documented in vcf/scan._is_sequence_allele): records whose chosen allele
or ALT1 is not literal sequence are parsed cleanly and skipped with a
warning (the overlap-skip philosophy, vcf_scan.cpp:210-213); half-calls
fold the missing haplotype to the ref allele.
"""

import gzip
import os

import numpy as np
import pytest

from pfbwtf_tpu.vcf.reader import VCF
from pfbwtf_tpu.vcf.scan import scan_vcf_sample

from .ref_fixtures import tmp_prefix
from .vcf_gen import random_vcf

BASES = np.frombuffer(b"ACGT", np.uint8)


def _write(path, text):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        f.write(text)


def _fasta(path, name, seq):
    with open(path, "w") as f:
        f.write(f">{name}\n{seq}\n")


HDR = (
    "##fileformat=VCFv4.2\n"
    "##contig=<ID=c1,length={L}>\n"
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\n"
)


def _scan(fa, vcf_path, hap=0):
    vcf = VCF(vcf_path)
    return scan_vcf_sample(vcf, fa, "s0", hap, w=10, ma_wsize=1,
                           want_markers=True)


def _seq_of(scan_res):
    return b"".join(bytes(s) for _, s in scan_res.records)


@pytest.mark.parametrize("alt,gt", [
    ("<DEL>", "1|1"),
    ("<INS>", "0|1"),
    ("<CN0>", "1|0"),
    ("A[c1:40[", "1|1"),      # breakend
    ("]c1:12]A", "1|1"),      # breakend, reverse form
    (".A", "1|1"),            # single breakend (leading .)
    ("A.", "1|1"),            # single breakend (trailing .)
    ("*", "1|1"),             # spanning deletion allele
])
def test_nonseq_alleles_skipped(alt, gt, capfd):
    ref = "ACGTACGTAGGCATCGATCGGATCGAAATTTCCCGGGATCG" * 3
    base = tmp_prefix("edge")
    fa = base + ".fa"
    _fasta(fa, "c1", ref)
    body = f"c1\t21\tv1\tA\t{alt}\t.\tPASS\t.\tGT\t{gt}\n"
    vp = base + ".vcf"
    _write(vp, HDR.format(L=len(ref)) + body)
    got = _seq_of(_scan(fa, vp))
    # record skipped: pure reference haplotype
    assert got == ref.encode()
    assert "skipping non-sequence allele" in capfd.readouterr().err


def test_nonseq_does_not_advance_overlap_window():
    """A skipped symbolic record must not shadow a later record that
    overlaps its REF span."""
    ref = "ACGTACGTAGGCATCGATCGGATCGAAATTTCCCGGGATCG" * 2
    base = tmp_prefix("edgewin")
    fa = base + ".fa"
    _fasta(fa, "c1", ref)
    body = (
        "c1\t11\tv1\tGGCAT\t<DEL>\t.\tPASS\t.\tGT\t1|1\n"
        "c1\t12\tv2\tG\tT\t.\tPASS\t.\tGT\t1|1\n"  # inside v1's REF span
    )
    vp = base + ".vcf"
    _write(vp, HDR.format(L=len(ref)) + body)
    got = _seq_of(_scan(fa, vp))
    want = ref[:11] + "T" + ref[12:]
    assert got == want.encode()


@pytest.mark.parametrize("gt,want_alt", [
    ("0|.", False),   # half-call: missing hap folds to ref
    (".|.", False),   # fully missing
    ("1|.", True),    # called hap applies the alt
])
def test_half_calls_fold_to_ref(gt, want_alt):
    ref = "ACGTACGTAGGCATCGATCGGATCGAAATTTCCCGGGATCG"
    base = tmp_prefix("edgehalf")
    fa = base + ".fa"
    _fasta(fa, "c1", ref)
    body = f"c1\t21\tv1\tG\tC\t.\tPASS\t.\tGT\t{gt}\n"
    vp = base + ".vcf"
    _write(vp, HDR.format(L=len(ref)) + body)
    got = _seq_of(_scan(fa, vp, hap=0))
    want = ref[:20] + ("C" if want_alt else "G") + ref[21:]
    assert got == want.encode()


def test_exotic_fuzz_matches_clean_scan():
    """Fuzz: a VCF with injected exotic records must scan to exactly the
    same haplotypes as the same VCF with those records removed."""
    rng = np.random.default_rng(0xE501)
    seq = BASES[rng.integers(0, 4, size=5000)]
    base = tmp_prefix("edgefuzz")
    fa = base + ".fa"
    _fasta(fa, "c1", bytes(seq).decode())
    vp = base + ".vcf"
    random_vcf(vp, [("c1", bytes(seq))], rng, nsamples=2,
               density=0.02, indel_frac=0.3, exotic_frac=0.35)
    # strip the injected exotic records (their IDs start with 'x') plus
    # half-call lines -> the clean twin
    kept = []
    for line in open(vp):
        cols = line.split("\t")
        if len(cols) > 2 and cols[2].startswith("x"):
            continue
        kept.append(line)
    vp_clean = base + ".clean.vcf"
    with open(vp_clean, "w") as f:
        f.writelines(kept)
    for hap in (0, 1):
        a = _seq_of(_scan(fa, vp, hap=hap))
        b = _seq_of(_scan(fa, vp_clean, hap=hap))
        assert a == b, f"hap {hap} differs with exotic records present"


def test_oracle_pipeline_agree_with_exotics():
    """Full pipeline vs the independent oracle on a fuzz VCF containing
    exotic records (both sides implement the documented skip rule)."""
    from pfbwtf_tpu.vcf.pipeline import VcfToBwtConfig, vcf_to_bwt
    from .oracle import oracle_outputs

    rng = np.random.default_rng(0xE502)
    seq = BASES[rng.integers(0, 4, size=3000)]
    base = tmp_prefix("edgeoracle")
    fa = base + ".fa"
    _fasta(fa, "c1", bytes(seq).decode())
    vp = base + ".vcf"
    random_vcf(vp, [("c1", bytes(seq))], rng, nsamples=2,
               density=0.015, indel_frac=0.25, exotic_frac=0.3)
    out = base + ".out"
    vcf_to_bwt(VcfToBwtConfig(
        fasta=fa, vcfs=[vp], output=out, sa=True, ma=True,
        wsize=10, mod=10, ma_wsize=1,
    ))
    vcf = VCF(vp)
    _, _, bwt, _, marker_lines = oracle_outputs(
        fa, vcf, list(vcf.samples), w=10
    )
    got_bwt = open(out + ".bwt", "rb").read()
    assert got_bwt == bwt.tobytes(), "BWT vs oracle mismatch"
    from pfbwtf_tpu.markers.dump import readable_markers_lines

    got_ma = [ln.rstrip() for ln in readable_markers_lines(out + ".ma")]
    assert got_ma == [ln.rstrip() for ln in marker_lines], "MA vs oracle"
