"""consensus -c chain output and -i/-e site filters.

Chain semantics follow bcftools consensus (consensus.cpp:144-260): one
chain per contig, ungapped blocks split at applied length-changing
variants, leading-base-shared indels shift by one, back-to-back variants
merge into the previous block's gaps.
"""

import numpy as np
import pytest

from pfbwtf_tpu.vcf.filter import compile_filter
from pfbwtf_tpu.vcf.reader import VCFRecord, GTView


def _rec(pos, ref, alts, qual=50.0, filt="PASS", gts=((1, 1),)):
    return VCFRecord(
        "chr1", pos, "id", [ref] + list(alts),
        GTView(np.array(gts, dtype=np.int16)), qual=qual, filter=filt,
    )


def test_filter_type():
    f = compile_filter('TYPE="snp"')
    assert f(_rec(5, "A", ["T"]))
    assert not f(_rec(5, "A", ["AT"]))
    g = compile_filter('TYPE!="indel"')
    assert g(_rec(5, "A", ["T"]))
    assert not g(_rec(5, "AT", ["A"]))


def test_filter_qual_pos_filter_combos():
    f = compile_filter('QUAL>30 && FILTER="PASS"')
    assert f(_rec(5, "A", ["T"], qual=31))
    assert not f(_rec(5, "A", ["T"], qual=30))
    assert not f(_rec(5, "A", ["T"], qual=99, filt="q10"))
    # missing QUAL never matches a numeric comparison
    assert not f(_rec(5, "A", ["T"], qual=float("nan")))
    g = compile_filter('POS<=10 || TYPE="indel"')
    assert g(_rec(9, "A", ["T"]))  # POS is 1-based: pos 9 -> POS 10
    assert not g(_rec(10, "A", ["T"]))
    assert g(_rec(99, "A", ["ATT"]))
    h = compile_filter('!(REF="A")')
    assert h(_rec(5, "C", ["T"]))
    assert not h(_rec(5, "A", ["T"]))


def test_filter_errors():
    from pfbwtf_tpu.utils.errors import PfbwtError

    with pytest.raises(PfbwtError):
        compile_filter("TYPE +")
    with pytest.raises(PfbwtError):  # TYPE only supports equality
        compile_filter('TYPE>"snp"')(_rec(5, "A", ["T"]))


def _write_case(tmp_path, ref_seq, vcf_lines):
    fa = tmp_path / "r.fa"
    fa.write_text(f">chr1\n{ref_seq}\n")
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        + "".join(vcf_lines)
    )
    return str(fa), str(vcf)


def test_chain_output(tmp_path):
    # ref: 30 bp; one deletion sharing the leading base, one insertion
    ref = "ACGTACGTACGTACGTACGTACGTACGTAC"
    lines = [
        "chr1\t5\t.\tACG\tA\t50\tPASS\t.\tGT\t1|1\n",   # del (pos 4, 0-based)
        "chr1\t15\t.\tG\tGTT\t50\tPASS\t.\tGT\t1|1\n",  # ins (pos 14)
    ]
    fa, vcf = _write_case(tmp_path, ref, lines)
    from pfbwtf_tpu.cli.consensus import main as cli

    out = tmp_path / "c.fa"
    chain = tmp_path / "c.chain"
    rc = cli([vcf, "-f", fa, "-s", "S", "-H", "1",
              "-o", str(out), "-c", str(chain)])
    assert rc == 0
    cons = out.read_text().splitlines()[1]
    # deletion removes 2 bp, insertion adds 2 bp
    assert len(cons) == len(ref)
    text = chain.read_text()
    lines_out = [l for l in text.splitlines() if l]
    # chain header: score chr ref_end + 0 ref_end chr alt_end + 0 alt_end id
    hdr = lines_out[0].split()
    assert hdr[0] == "chain"
    assert hdr[2] == "chr1" and hdr[3] == str(len(ref))
    assert hdr[8] == str(len(cons))
    assert hdr[-1] == "1"
    # blocks: leading-base-shared del -> block [0,5), gap ref 2 alt 0;
    # leading-base-shared ins -> block [7,15), gap ref 0 alt 2; tail 15
    assert lines_out[1].split() == ["5", "2", "0"]
    assert lines_out[2].split() == ["8", "0", "2"]
    assert lines_out[3].split() == ["15"]


def test_chain_back_to_back_merge(tmp_path):
    ref = "A" * 20
    lines = [
        # del sharing the leading base: push(3, 2, ..) -> ref_last = 5
        "chr1\t3\t.\tAAA\tA\t50\tPASS\t.\tGT\t1|1\n",
        # non-shared-leading-base del right after: push(5, 2, ..) with
        # ref_start == ref_last -> merges into the previous block's gaps
        "chr1\t6\t.\tAA\tC\t50\tPASS\t.\tGT\t1|1\n",
    ]
    fa, vcf = _write_case(tmp_path, ref, lines)
    from pfbwtf_tpu.cli.consensus import main as cli

    out = tmp_path / "c.fa"
    chain = tmp_path / "c.chain"
    assert cli([vcf, "-f", fa, "-s", "S", "-H", "1", "-o", str(out),
                "-c", str(chain)]) == 0
    lines_out = [l for l in chain.read_text().splitlines() if l]
    assert len(lines_out) == 3  # header + 1 merged block + tail
    assert lines_out[1].split() == ["3", "4", "1"]
    assert lines_out[2].split() == ["13"]


def test_include_exclude_filters_e2e(tmp_path):
    ref = "ACGTACGTACGTACGTACGT"
    lines = [
        "chr1\t2\t.\tC\tG\t50\tPASS\t.\tGT\t1|1\n",       # snp
        "chr1\t6\t.\tCGT\tC\t50\tPASS\t.\tGT\t1|1\n",     # del
        "chr1\t12\t.\tG\tT\t10\tq10\t.\tGT\t1|1\n",       # low-qual snp
    ]
    fa, vcf = _write_case(tmp_path, ref, lines)
    from pfbwtf_tpu.cli.consensus import main as cli

    # include only snps: deletion not applied
    out1 = tmp_path / "snps.fa"
    assert cli([vcf, "-f", fa, "-s", "S", "-H", "1", "-o", str(out1),
                "-i", 'TYPE="snp"']) == 0
    got1 = out1.read_text().splitlines()[1]
    # direct expectation: snp at pos1 C->G, snp at pos11 G->T, no del
    want1 = list(ref)
    want1[1] = "G"
    want1[11] = "T"
    assert got1 == "".join(want1)
    # exclude low-qual: only PASS records applied
    out2 = tmp_path / "hq.fa"
    assert cli([vcf, "-f", fa, "-s", "S", "-H", "1", "-o", str(out2),
                "-e", "QUAL<30"]) == 0
    got2 = out2.read_text().splitlines()[1]
    want2 = ref[:1] + "G" + ref[2:6] + ref[8:]  # snp applied, del applied
    assert got2 == want2


def _reci(pos, ref, alts, info=".", gts=((1, 1),), qual=50.0):
    return VCFRecord(
        "chr1", pos, "id", [ref] + list(alts),
        GTView(np.array(gts, dtype=np.int16)), qual=qual, filter="PASS",
        info=info,
    )


def test_filter_info_numeric_string_flag():
    f = compile_filter("INFO/DP>10")
    assert f(_reci(5, "A", ["T"], info="DP=15;DB"))
    assert not f(_reci(5, "A", ["T"], info="DP=3"))
    assert not f(_reci(5, "A", ["T"], info="."))  # absent never matches
    # bare tag falls through to INFO
    g = compile_filter("DP<=3")
    assert g(_reci(5, "A", ["T"], info="DP=3"))
    # string INFO
    s = compile_filter('INFO/SVTYPE="DEL"')
    assert s(_reci(5, "A", ["T"], info="SVTYPE=DEL"))
    assert not s(_reci(5, "A", ["T"], info="SVTYPE=INS"))
    # flag atoms: bare and compared
    b = compile_filter("DB")
    assert b(_reci(5, "A", ["T"], info="DP=1;DB"))
    assert not b(_reci(5, "A", ["T"], info="DP=1"))
    eq = compile_filter("DB=1")
    assert eq(_reci(5, "A", ["T"], info="DB"))
    assert not eq(_reci(5, "A", ["T"], info="."))


def test_filter_info_vector_any_element():
    f = compile_filter("AF>0.4")
    assert f(_reci(5, "A", ["T", "G"], info="AF=0.1,0.5"))
    assert not f(_reci(5, "A", ["T", "G"], info="AF=0.1,0.2"))


def test_filter_gt_classes():
    het = compile_filter('GT="het"')
    hom = compile_filter('GT="hom"')
    mis = compile_filter('GT="mis"')
    lit = compile_filter('FMT/GT="0|1"')
    r = _reci(5, "A", ["T"], gts=((0, 1), (0, 0)))
    assert het(r) and not mis(r) and hom(r)  # hom: sample 2 is 0/0
    assert lit(r)
    r2 = _reci(5, "A", ["T"], gts=((-1, -1),))
    assert mis(r2) and not het(r2)
    alt = compile_filter('GT="alt"')
    assert alt(r) and not alt(_reci(5, "A", ["T"], gts=((0, 0),)))


def test_filter_combined_info_site():
    f = compile_filter('TYPE="snp" && INFO/DP>=10 && GT="het"')
    assert f(_reci(5, "A", ["T"], info="DP=10", gts=((0, 1),)))
    assert not f(_reci(5, "A", ["T"], info="DP=9", gts=((0, 1),)))
    assert not f(_reci(5, "A", ["T"], info="DP=10", gts=((1, 1),)))


def test_filter_arithmetic_and_functions():
    """htslib expression-language extensions: arithmetic over fields and
    vectors, reduction functions, STRLEN/ABS/ILEN
    (consensus.cpp:288 -i/-e semantics)."""
    f = compile_filter("QUAL/2 > 20")
    assert f(_reci(5, "A", ["T"]))          # 50/2 = 25
    assert not f(_reci(5, "A", ["T"], qual=30.0))
    f = compile_filter("QUAL-45 >= 5 && QUAL*2 == 100")
    assert f(_reci(5, "A", ["T"]))
    # DP-5 tokenizes as [DP, -5]; must still mean subtraction
    f = compile_filter("DP-5 > 0")
    assert f(_reci(5, "A", ["T"], info="DP=15"))
    assert not f(_reci(5, "A", ["T"], info="DP=4"))
    # vector arithmetic: any-element comparison
    f = compile_filter("INFO/AF*100 >= 50")
    assert f(_reci(5, "A", ["T"], info="AF=0.1,0.6"))
    assert not f(_reci(5, "A", ["T"], info="AF=0.1,0.2"))
    # functions
    assert compile_filter("MAX(INFO/AD) > 9")(
        _reci(5, "A", ["T"], info="AD=3,10"))
    assert not compile_filter("MIN(INFO/AD) > 9")(
        _reci(5, "A", ["T"], info="AD=3,10"))
    assert compile_filter("SUM(AD) == 13")(
        _reci(5, "A", ["T"], info="AD=3,10"))
    assert compile_filter("AVG(AD) == 6.5")(
        _reci(5, "A", ["T"], info="AD=3,10"))
    assert compile_filter("COUNT(AD) == 2")(
        _reci(5, "A", ["T"], info="AD=3,10"))
    assert compile_filter("ABS(ILEN) == 2")(
        _reci(5, "ACG", ["A"], info="."))
    assert compile_filter("STRLEN(REF) == 3")(
        _reci(5, "ACG", ["A"]))
    # missing tags propagate through arithmetic/functions -> no match
    assert not compile_filter("MAX(INFO/AD) > 0")(
        _reci(5, "A", ["T"], info="."))
    assert not compile_filter("DP+1 > 0")(_reci(5, "A", ["T"], info="."))
    # unary minus and N_ALT / N_SAMPLES pseudo-fields
    assert compile_filter("-QUAL < -40")(_reci(5, "A", ["T"]))
    assert compile_filter("N_ALT == 1 && N_SAMPLES == 1")(
        _reci(5, "A", ["T"]))
    # parenthesized arithmetic grouping
    assert compile_filter("(QUAL+10)/2 == 30")(_reci(5, "A", ["T"]))


def test_filter_arithmetic_errors():
    from pfbwtf_tpu.utils.errors import PfbwtError

    with pytest.raises(PfbwtError):
        compile_filter('TYPE + 1 > 0')(_reci(5, "A", ["T"]))
    with pytest.raises(PfbwtError):
        compile_filter('STRLEN(QUAL) > 0')(_reci(5, "A", ["T"]))


def test_filter_format_tags(tmp_path):
    """FMT/TAG lookups (any-sample, any-element) over the opt-in raw
    FORMAT arena; absent tags never match; GT matrix path untouched."""
    from pfbwtf_tpu.vcf.reader import merge_vcfs

    vcf = tmp_path / "f.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1,length=100>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        "chr1\t5\t.\tA\tT\t50\tPASS\tDP=20\tGT:DP:AD\t0|1:7:3,4\t1|1:31:15,16\n"
        "chr1\t9\t.\tG\tC\t50\tPASS\t.\tGT\t0|0\t0|1\n"
    )
    v = merge_vcfs([str(vcf)], store_format=True)
    recs = list(v.records_for_contig("chr1"))
    f = compile_filter("FMT/DP > 30")
    assert f(recs[0])            # S2 has DP=31
    assert not f(recs[1])        # no DP tag -> absent -> no match
    g = compile_filter("MAX(FMT/AD) >= 16 && FMT/DP >= 7")
    assert g(recs[0])
    h = compile_filter('FMT/GT = "0|1"')   # GT still via the matrix
    assert h(recs[0]) and h(recs[1])
    # without store_format, FMT/TAG dies with a clear message
    from pfbwtf_tpu.utils.errors import PfbwtError

    v2 = merge_vcfs([str(vcf)])
    with pytest.raises(PfbwtError, match="FORMAT tag"):
        compile_filter("FMT/DP > 1")(list(v2.records_for_contig("chr1"))[0])


def test_filter_regex_match():
    """~ / !~ regex operators (htslib filter.c semantics: ERE search,
    any-element over vectors)."""
    from dataclasses import replace
    f = compile_filter('REF~"^A[CG]$"')
    assert f(_rec(5, "AC", ["A"]))
    assert not f(_rec(5, "AT", ["A"]))
    g = compile_filter('ID~"^rs[0-9]+"')
    assert g(replace(_rec(5, "A", ["T"]), vid="rs123"))
    assert not g(replace(_rec(5, "A", ["T"]), vid="var1"))
    n = compile_filter('ID!~"^rs"')
    assert n(replace(_rec(5, "A", ["T"]), vid="var1"))
    assert not n(replace(_rec(5, "A", ["T"]), vid="rs9"))
    # FILTER string and INFO string vectors
    soft = compile_filter('FILTER~"LowQual"')
    assert soft(_rec(5, "A", ["T"], filt="LowQual;SnpCluster"))
    assert not soft(_rec(5, "A", ["T"], filt="PASS"))
    v = compile_filter('INFO/SVTYPE~"DEL|DUP"')
    r = replace(_rec(5, "A", ["T"]), info="SVTYPE=DUP")
    assert v(r)
    assert not v(replace(_rec(5, "A", ["T"]), info="SVTYPE=INV"))
    # absent tag: ~ false, !~ true
    assert not v(_rec(5, "A", ["T"]))
    assert compile_filter('INFO/SVTYPE!~"DEL"')(_rec(5, "A", ["T"]))
    from pfbwtf_tpu.utils.errors import PfbwtError

    with pytest.raises(PfbwtError, match="regex"):
        compile_filter('ID~"["')(_rec(5, "A", ["T"]))


def test_filter_at_file_sets(tmp_path):
    """@file value sets: ID=@ids.txt membership (filter.c @file)."""
    from dataclasses import replace
    ids = tmp_path / "ids.txt"
    ids.write_text("rs1\nrs7 rs9\n")
    f = compile_filter(f"ID=@{ids}")
    assert f(replace(_rec(5, "A", ["T"]), vid="rs7"))
    assert not f(replace(_rec(5, "A", ["T"]), vid="rs2"))
    n = compile_filter(f"ID!=@{ids}")
    assert n(replace(_rec(5, "A", ["T"]), vid="rs2"))
    assert not n(replace(_rec(5, "A", ["T"]), vid="rs1"))
    # combines with boolean operators; missing file dies cleanly
    c = compile_filter(f'ID=@{ids} && TYPE="snp"')
    assert c(replace(_rec(5, "A", ["T"]), vid="rs9"))
    from pfbwtf_tpu.utils.errors import PfbwtError

    with pytest.raises(PfbwtError, match="cannot read"):
        compile_filter(f"ID=@{tmp_path}/absent.txt")


def test_filter_format_tags_on_bcf(tmp_path):
    """FMT/TAG filters on BCF input: the binary FORMAT block is re-encoded
    to the text surface under store_format (int, vector-int, GT tags;
    MISSING and END_OF_VECTOR honored)."""
    import gzip
    import struct

    from pfbwtf_tpu.vcf.reader import merge_vcfs

    from .test_bcf import _typed, _typed_i8vec, _typed_str

    header = (
        b"##fileformat=VCFv4.2\n"
        b'##FILTER=<ID=q10,Description="x">\n'
        b'##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
        b'##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
        b'##FORMAT=<ID=AD,Number=2,Type=Integer,Description="a">\n'
        b"##contig=<ID=chr1,length=100>\n"
        b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n"
        b"\x00"
    )
    # string dict: PASS=0, q10=1, GT=2, DP=3, AD=4
    out = bytearray(b"BCF\x02\x02")
    out += struct.pack("<I", len(header))
    out += header

    shared = bytearray()
    shared += struct.pack("<iii", 0, 4, 1)        # chrom, pos(0-based), rlen
    shared += struct.pack("<f", 50.0)             # qual
    shared += struct.pack("<I", (2 << 16) | 0)    # n_allele=2, n_info=0
    shared += struct.pack("<I", (3 << 24) | 2)    # n_fmt=3, n_sample=2
    shared += _typed_str(b"rs5")
    shared += _typed_str(b"A")
    shared += _typed_str(b"T")
    shared += _typed_i8vec([])                    # FILTER: none -> "."

    indiv = bytearray()
    indiv += _typed_i8vec([2])                    # key GT
    indiv += _typed(1, 2)
    indiv += struct.pack("<2b", 2, 5)             # S1 0|1
    indiv += struct.pack("<2b", 4, 5)             # S2 1|1
    indiv += _typed_i8vec([3])                    # key DP
    indiv += _typed(1, 1)
    indiv += struct.pack("<b", 7)                 # S1 DP=7
    indiv += struct.pack("<b", 31)                # S2 DP=31
    indiv += _typed_i8vec([4])                    # key AD
    indiv += _typed(1, 2)
    indiv += struct.pack("<2b", 3, 4)             # S1 AD=3,4
    indiv += struct.pack("<2b", 15, 16)           # S2 AD=15,16

    out += struct.pack("<II", len(shared), len(indiv))
    out += shared
    out += indiv

    bcf = tmp_path / "f.bcf"
    with gzip.open(bcf, "wb") as fp:
        fp.write(bytes(out))

    v = merge_vcfs([str(bcf)], store_format=True)
    (rec,) = list(v.records_for_contig("chr1"))
    assert rec.fmt.split("\t")[0] == "GT:DP:AD"
    assert rec.fmt.split("\t")[1] == "0|1:7:3,4"
    f = compile_filter("FMT/DP > 30")
    assert f(rec)
    assert not compile_filter("FMT/DP > 40")(rec)
    g = compile_filter("MAX(FMT/AD) >= 16 && FMT/DP >= 7")
    assert g(rec)
    assert compile_filter('FMT/GT = "0|1"')(rec)
    assert compile_filter("FMT/XX > 1")(rec) is False  # absent tag
