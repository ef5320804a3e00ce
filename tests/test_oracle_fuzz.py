"""Fuzzed end-to-end: pipeline vs independent brute-force oracle on random
FASTA + random VCF (with indels).  Extends the three committed datasets to
arbitrary inputs — the marker/bias/overlap edge cases live here."""

import numpy as np
import pytest

from pfbwtf_tpu.markers.dump import readable_markers_lines
from pfbwtf_tpu.vcf.pipeline import VcfToBwtConfig, vcf_to_bwt
from pfbwtf_tpu.vcf.reader import VCF

from .oracle import oracle_outputs
from .ref_fixtures import random_fasta, tmp_prefix
from .vcf_gen import random_vcf


def _run_fuzz_case(seed, ncontigs, length, nsamples, density, indel_frac):
    rng = np.random.default_rng(seed)
    base = tmp_prefix(f"fuzz{seed}")
    fa = random_fasta(base + ".fa", rng, nrecords=ncontigs, length=length)
    vcf_path = base + ".vcf"
    from pfbwtf_tpu.io.fasta import read_fasta_bytes

    contigs = [(n, s) for n, s in read_fasta_bytes(fa)]
    samples = random_vcf(vcf_path, contigs, rng, nsamples=nsamples,
                         density=density, indel_frac=indel_frac)
    out = base + ".out"
    cfg = VcfToBwtConfig(
        fasta=fa, vcfs=[vcf_path], output=out, sa=True, ma=True,
        wsize=10, mod=10, ma_wsize=1,
    )
    vcf_to_bwt(cfg)
    vcf = VCF(vcf_path)
    big, sa_o, bwt_o, markers, marker_lines = oracle_outputs(fa, vcf, samples)
    bwt_p = np.frombuffer(open(out + ".bwt", "rb").read(), dtype=np.uint8)
    sa_p = np.frombuffer(open(out + ".sa", "rb").read(), dtype=np.uint64)
    n = big.shape[0]
    assert bwt_p.shape[0] == n + 1
    assert np.array_equal(bwt_p, bwt_o), "BWT != oracle"
    # oracle SA has the empty suffix as index n; pipeline writes n there
    assert int(sa_p[0]) == n
    assert np.array_equal(sa_p[1:].astype(np.int64), sa_o[1:]), "SA != oracle"
    got_lines = list(readable_markers_lines(out + ".ma"))
    assert got_lines == marker_lines, (
        f"MA != oracle ({len(got_lines)} vs {len(marker_lines)} lines); "
        f"first diff "
        f"{next(((a, b) for a, b in zip(got_lines, marker_lines) if a != b), None)}"
    )


@pytest.mark.parametrize(
    "seed,ncontigs,length,nsamples,density,indel_frac",
    [
        (101, 1, 3000, 2, 0.01, 0.0),   # SNPs only
        (102, 2, 2000, 2, 0.02, 0.3),   # indels
        (103, 3, 1000, 3, 0.05, 0.5),   # dense, indel-heavy
        (104, 1, 5000, 1, 0.005, 0.2),  # sparse
    ],
)
def test_pipeline_matches_oracle(seed, ncontigs, length, nsamples, density,
                                 indel_frac):
    _run_fuzz_case(seed, ncontigs, length, nsamples, density, indel_frac)


def test_multi_vcf_merge():
    """Two VCF files over the same contigs merge into one record stream
    (the synced-reader role, vcf_scanner.hpp:86-95)."""
    rng = np.random.default_rng(55)
    base = tmp_prefix("mvcf")
    fa = random_fasta(base + ".fa", rng, nrecords=1, length=2000)
    from pfbwtf_tpu.io.fasta import read_fasta_bytes
    from pfbwtf_tpu.vcf.reader import merge_vcfs

    contigs = [(n, s) for n, s in read_fasta_bytes(fa)]
    # split one generated VCF's records into two files by parity
    vcf_all = base + ".all.vcf"
    samples = random_vcf(vcf_all, contigs, rng, nsamples=1, density=0.01,
                         indel_frac=0.0)
    lines = open(vcf_all).read().splitlines()
    header = [l for l in lines if l.startswith("#")]
    recs = [l for l in lines if not l.startswith("#")]
    for i, part in enumerate((recs[0::2], recs[1::2])):
        with open(f"{base}.part{i}.vcf", "w") as f:
            f.write("\n".join(header + list(part)) + "\n")
    merged = merge_vcfs([f"{base}.part0.vcf", f"{base}.part1.vcf"])
    single = merge_vcfs([vcf_all])
    for contig, _ in contigs:
        a = [(r.pos, r.alleles[0], r.alleles[1]) for r in
             merged.records_for_contig(contig)]
        b = [(r.pos, r.alleles[0], r.alleles[1]) for r in
             single.records_for_contig(contig)]
        assert a == b
    # pipelines over the split and single VCFs agree
    out_a, out_b = base + ".a", base + ".b"
    for out, vcfs in ((out_a, [f"{base}.part0.vcf", f"{base}.part1.vcf"]),
                      (out_b, [vcf_all])):
        cfg = VcfToBwtConfig(fasta=fa, vcfs=vcfs, output=out, sa=True,
                             ma=True, mod=10)
        vcf_to_bwt(cfg)
    assert open(out_a + ".bwt", "rb").read() == open(out_b + ".bwt", "rb").read()
    assert open(out_a + ".ma", "rb").read() == open(out_b + ".ma", "rb").read()
