"""Consensus CLI transform options (consensus.cpp:469-507, 1105-1130):
mark-del / mark-ins / mark-snv / absent / missing / prefix / mask."""

import numpy as np
import pytest

from pfbwtf_tpu.cli import consensus as consensus_cli

REF = "ACGTACGTACGT"

VCF_BODY = """##fileformat=VCFv4.2
##contig=<ID=c,length=12>
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0
c\t2\tv1\tC\tT\t.\t.\t.\tGT\t1|1
c\t5\tv2\tA\tAGG\t.\t.\t.\tGT\t1|0
c\t8\tv3\tTAC\tT\t.\t.\t.\tGT\t1|1
c\t11\tv4\tG\tA\t.\t.\t.\tGT\t./.
"""


@pytest.fixture
def fixture(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(f">c\n{REF}\n")
    vcf = tmp_path / "v.vcf"
    vcf.write_text(VCF_BODY)
    return str(fa), str(vcf), tmp_path


def _run(fixture, *extra):
    fa, vcf, tmp = fixture
    out = tmp / "out.fa"
    rc = consensus_cli.main(
        [vcf, "-f", fa, "-s", "s0", "-H", "1", "-o", str(out), *extra]
    )
    assert rc == 0
    lines = out.read_text().splitlines()
    return lines[0], "".join(lines[1:])


def test_consensus_plain(fixture):
    hdr, seq = _run(fixture)
    # SNP C->T, ins A->AGG, del TAC->T, missing ./. applies REF
    assert seq == "ATGTAGGCGTGT"
    assert hdr == ">s0.0.c"


def test_consensus_marks_and_chars(fixture):
    hdr, seq = _run(
        fixture, "--mark-snv", "lc", "--mark-ins", "lc",
        "--mark-del", "-", "-M", ".", "-a", "N", "-p", "px_",
    )
    assert seq == "NtNNAggNNT--.N"
    assert hdr == ">px_s0.0.c"


def test_consensus_mask_char_skips_variants(fixture):
    fa, vcf, tmp = fixture
    bed = tmp / "m.bed"
    bed.write_text("c\t0\t2\n")
    hdr, seq = _run(fixture, "-m", str(bed))
    # v1 (POS 2) overlaps the masked region and is skipped
    assert seq == "NNGTAGGCGTGT"


def test_consensus_mask_lowercase_keeps_variants(fixture):
    fa, vcf, tmp = fixture
    bed = tmp / "m.bed"
    bed.write_text("c\t0\t2\n")
    hdr, seq = _run(fixture, "-m", str(bed), "--mask-with", "lc")
    assert seq == "aTGTAGGCGTGT"


def test_consensus_second_haplotype(fixture):
    fa, vcf, tmp = fixture
    out = tmp / "h2.fa"
    rc = consensus_cli.main(
        [vcf, "-f", fa, "-s", "s0", "-H", "2", "-o", str(out)]
    )
    assert rc == 0
    seq = "".join(out.read_text().splitlines()[1:])
    # hap 2: SNP applied, insertion NOT applied (1|0), deletion applied
    assert seq == "ATGTACGTGT"


def test_consensus_rejects_length_change_with_markers(fixture):
    fa, vcf, tmp = fixture
    rc = consensus_cli.main(
        [vcf, "-f", fa, "-s", "s0", "-o", str(tmp / "x.fa"),
         "-x", str(tmp / "x.mps"), "--mark-del", "-"]
    )
    assert rc == 1


def test_consensus_bad_mark_value(fixture):
    fa, vcf, tmp = fixture
    with pytest.raises(SystemExit):
        consensus_cli.main(
            [vcf, "-f", fa, "-s", "s0", "-o", str(tmp / "x.fa"),
             "--mark-ins", "xx"]
        )
