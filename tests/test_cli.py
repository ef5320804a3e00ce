"""CLI smoke tests: flag surfaces + staged --parse-only/--pfbwt-only
checkpoint protocol (pfbwt-f.cpp:353-366)."""

import os
import shutil

import numpy as np

from pfbwtf_tpu.cli import (
    dump_markers,
    merge_mps,
    merge_pfp,
    mps_to_ma,
    pfbwt_f,
    simplebwt,
    vcf_scan,
    vcf_to_bwt,
)

from .ref_fixtures import random_fasta, tmp_prefix

DATA = "/root/reference/tests/data"


def test_pfbwt_staged_equals_oneshot(rng):
    fa = random_fasta(tmp_prefix("cli") + ".fa", rng, nrecords=2, length=1500)
    one = tmp_prefix("one")
    staged = tmp_prefix("staged")
    assert pfbwt_f.main([fa, "-o", one, "-s", "-r", "-p", "10"]) == 0
    assert pfbwt_f.main([fa, "-o", staged, "-s", "-r", "-p", "10",
                         "--parse-only"]) == 0
    assert not os.path.exists(staged + ".bwt")
    assert pfbwt_f.main([fa, "-o", staged, "-s", "-r", "-p", "10",
                         "--pfbwt-only"]) == 0
    for ext in ["bwt", "sa", "ssa", "esa"]:
        assert (
            open(f"{one}.{ext}", "rb").read()
            == open(f"{staged}.{ext}", "rb").read()
        ), ext


def test_pfbwt_stdout_redirect(rng, capfdbinary):
    fa = random_fasta(tmp_prefix("so") + ".fa", rng, nrecords=1, length=800)
    out = tmp_prefix("so")
    assert pfbwt_f.main([fa, "-o", out, "-p", "10", "-c", "bwt"]) == 0
    stdout, _ = capfdbinary.readouterr()
    assert not os.path.exists(out + ".bwt")
    # round-trip: run again without redirect and compare
    out2 = tmp_prefix("so2")
    assert pfbwt_f.main([fa, "-o", out2, "-p", "10"]) == 0
    assert stdout == open(out2 + ".bwt", "rb").read()


def test_simplebwt_agrees_with_pipeline(rng):
    fa = random_fasta(tmp_prefix("sb") + ".fa", rng, nrecords=1, length=1000)
    out = tmp_prefix("sb")
    assert simplebwt.main([fa, "-o", out + ".simple", "-s"]) == 0
    # simplebwt builds BWT of the raw record (no 'A' pads); pipeline pads.
    # Compare against a padded-input simplebwt instead:
    from pfbwtf_tpu.cli.simplebwt import bwt_via_sa
    from pfbwtf_tpu.io.fasta import read_fasta_bytes

    recs = read_fasta_bytes(fa)
    padded = np.concatenate(
        [np.concatenate((s, np.full(10, ord("A"), np.uint8))) for _, s in recs]
    )
    bwt, _ = bwt_via_sa(padded)
    assert pfbwt_f.main([fa, "-o", out, "-p", "10"]) == 0
    assert np.array_equal(
        np.frombuffer(open(out + ".bwt", "rb").read(), dtype=np.uint8), bwt
    )


def test_vcf_scan_and_tools_pipeline():
    out = tmp_prefix("vs")
    fa = out + ".ref.input.fa"
    shutil.copy(f"{DATA}/single_chrom.fa", fa)
    vcfgz = f"{DATA}/single_chrom.vcf.gz"
    # ref-only scan with markers
    assert vcf_scan.main(["-f", fa, "-o", out, "-r", "-m",
                          "-x", "1", vcfgz]) == 0
    assert os.path.exists(out + ".ref.fa")
    assert os.path.exists(out + ".ref.mps")
    # a sample scan
    from pfbwtf_tpu.vcf.reader import VCF

    sample = VCF(vcfgz).samples[0]
    assert vcf_scan.main(["-f", fa, "-o", out, "-S", sample, "-H", "1",
                          "-m", "-x", "1", vcfgz]) == 0
    prefix = f"{out}.{sample}.1"
    assert os.path.exists(prefix + ".fa")
    # merge_mps over the two prefixes
    merged = out + ".merged.mps"
    assert merge_mps.main([merged, out + ".ref", prefix]) == 0
    assert os.path.getsize(merged) > 0
    assert dump_markers.main([merged]) == 0


def test_vcf_to_bwt_cli_with_sample_file():
    out = tmp_prefix("v2b")
    fa = out + ".input.fa"
    shutil.copy(f"{DATA}/single_chrom.fa", fa)
    vcfgz = f"{DATA}/single_chrom.vcf.gz"
    from pfbwtf_tpu.vcf.reader import VCF

    samples = VCF(vcfgz).samples[:2]
    sfile = out + ".samples"
    with open(sfile, "w") as f:
        f.write("\n".join(samples) + "\n")
    assert vcf_to_bwt.main([fa, vcfgz, "-o", out, "-S", sfile, "-s", "-m",
                            "--keep_parse"]) == 0
    assert os.path.exists(out + ".bwt")
    assert os.path.exists(out + ".ma")
    sa = np.frombuffer(open(out + ".sa", "rb").read(), dtype=np.uint64)
    n = int(sa[0])
    # 1 ref + 2 samples x 2 haps = 5 copies of (10000 + 10 pad)
    assert n == 5 * 10010


def test_pfbwt_sharded_and_chunked_flags(rng):
    fa = random_fasta(tmp_prefix("sc") + ".fa", rng, nrecords=4, length=800)
    base, pod, chk = tmp_prefix("b"), tmp_prefix("p"), tmp_prefix("c")
    assert pfbwt_f.main([fa, "-o", base, "-s", "-p", "10"]) == 0
    assert pfbwt_f.main([fa, "-o", pod, "-s", "-p", "10", "--shards", "3"]) == 0
    assert pfbwt_f.main([fa, "-o", chk, "-s", "-p", "10",
                         "--chunk-mb", "1"]) == 0
    msh = tmp_prefix("m")
    assert pfbwt_f.main([fa, "-o", msh, "-s", "-p", "10", "--mesh"]) == 0
    for out in (pod, chk, msh):
        assert (
            open(f"{base}.bwt", "rb").read() == open(f"{out}.bwt", "rb").read()
        )
        assert (
            open(f"{base}.sa", "rb").read() == open(f"{out}.sa", "rb").read()
        )


def test_pfbwt_device_flag(rng):
    """--device (device-resident pipeline) produces byte-identical outputs
    to the host path.  The flag sets PFBWT_* env vars process-wide, so
    snapshot/restore them to keep other tests on their default backends."""
    envs = ("PFBWT_BACKEND", "PFBWT_DICT_IMPL",
            "PFBWT_ASSEMBLE_BACKEND", "PFBWT_MA_BACKEND")
    snapshot = {v: os.environ.get(v) for v in envs}
    fa = random_fasta(tmp_prefix("dv") + ".fa", rng, nrecords=2, length=900)
    base, dev = tmp_prefix("dvb"), tmp_prefix("dvd")
    try:
        for v in envs:
            os.environ.pop(v, None)
        assert pfbwt_f.main([fa, "-o", base, "-s", "-r", "-p", "10"]) == 0
        assert pfbwt_f.main([fa, "-o", dev, "-s", "-r", "-p", "10",
                             "--device"]) == 0
    finally:
        for v, val in snapshot.items():
            if val is None:
                os.environ.pop(v, None)
            else:
                os.environ[v] = val
    for ext in (".bwt", ".sa", ".ssa", ".esa"):
        assert (
            open(base + ext, "rb").read() == open(dev + ext, "rb").read()
        ), ext


def test_dump_intfile(tmp_path, capsys):
    from pfbwtf_tpu.cli import dump_intfile

    f32 = tmp_path / "x.u32"
    f32.write_bytes(np.array([1, 2, 70000], np.uint32).tobytes())
    assert dump_intfile.main([str(f32)]) == 0
    assert capsys.readouterr().out == "1\n2\n70000\n"
    f64 = tmp_path / "x.u64"
    f64.write_bytes(np.array([1 << 40, 7], np.uint64).tobytes())
    assert dump_intfile.main([str(f64), "-l"]) == 0
    assert capsys.readouterr().out == f"{1 << 40}\n7\n"
