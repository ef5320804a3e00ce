"""Independent brute-force oracle for the FASTA+VCF pipeline.

Re-implements scripts/generate_truth_set.py's logic without any PFP
machinery: haplotypes by direct position splicing, the suffix array by the
native SA-IS kernel (or numpy doubling), BWT by the textbook formula,
markers by the truth-set placement rules (generate_truth_set.py:30-88).
Everything here is deliberately a *different* code path from
pfbwtf_tpu.vcf.scan / ops.* so pipeline-vs-oracle agreement is meaningful.
"""

import numpy as np


def _nonseq_allele(a: str) -> bool:
    """Symbolic ALTs, breakends, '*' — no splice-able sequence (mirrors
    the documented skip rule in pfbwtf_tpu.vcf.scan._is_sequence_allele;
    this oracle re-derives the same spec independently)."""
    return (
        not a or a == "*" or a[0] == "<" or "[" in a or "]" in a
        or a[0] == "." or a[-1] == "."
    )


def _skip_nonseq(rec, gt) -> bool:
    alt1 = rec.alleles[1] if len(rec.alleles) > 1 else ""
    return (gt > 0 and _nonseq_allele(rec.alleles[gt])) or (
        bool(alt1) and _nonseq_allele(alt1)
    )


def apply_variants(seq: bytes, records, hap: int, sample_idx: int,
                   ref_only: bool):
    """Direct splice of a haplotype; skip rule per vcf_scan.cpp:210-213."""
    out = []
    cursor = 0
    prev_end = 0
    for rec in records:
        rlen = len(rec.alleles[0])
        if not (prev_end <= rec.pos):
            continue  # overlapping variant skipped
        gt = 0 if ref_only else rec.gts[sample_idx][hap]
        if gt == -1:
            gt = 0
        if _skip_nonseq(rec, gt):
            continue  # symbolic/breakend/'*' allele skipped
        out.append(seq[cursor : rec.pos])
        out.append(rec.alleles[gt].encode())
        cursor = rec.pos + rlen
        prev_end = rec.pos + rlen
    out.append(seq[cursor:])
    return b"".join(out)


def truth_markers_for_hap(records, hap, sample_idx, ref_only, base, bias0=0):
    """Marker dict pos -> (rid=0-based contig id handled by caller, refpos,
    gt), per generate_truth_set.py:56-80 (last writer wins)."""
    markers = {}
    bias = bias0
    prev_end = 0
    for rec in records:
        rlen = len(rec.alleles[0])
        if not (prev_end <= rec.pos):
            continue
        gt = 0 if ref_only else rec.gts[sample_idx][hap]
        if gt == -1:
            gt = 0
        if _skip_nonseq(rec, gt):
            continue
        prev_end = rec.pos + rlen
        alen = len(rec.alleles[1]) if len(rec.alleles) > 1 else rlen
        if rlen == 1 and alen == 1:
            markers[base + bias + rec.pos] = (rec.pos, gt)
        elif rlen != alen and gt == 0:
            for i in range(rlen + 1):
                markers[base + bias + rec.pos + i] = (rec.pos, gt)
        elif rlen > alen and gt > 0:
            markers[base + bias + rec.pos] = (rec.pos, gt)
            markers[base + bias + rec.pos + 1] = (rec.pos, gt)
            bias -= rlen - 1
        elif rlen < alen and gt > 0:
            for i in range(alen + 1):
                markers[base + bias + rec.pos + i] = (rec.pos, gt)
            bias += alen - 1
        # rlen == alen > 1: no marker, no bias (MNP)
    return markers, bias


def brute_sa(text: np.ndarray) -> np.ndarray:
    """SA of text + implicit unique terminator: returns order of suffixes
    including the empty suffix first (index n)."""
    from pfbwtf_tpu import native
    from pfbwtf_tpu.ops.suffix import suffix_array_ints_np

    seq = np.concatenate((text.astype(np.int64) + 1, [0]))
    if native.available():
        return native.suffix_array_ints_native(seq)
    return suffix_array_ints_np(seq)


def oracle_outputs(fasta_path: str, vcf, samples, w: int = 10):
    """(big_seq, sa, bwt, markers dict, marker lines) for the whole
    collection in pipeline order: ref, then per sample hap0, hap1."""
    from pfbwtf_tpu.io.fasta import fetch_contig

    pad = b"A" * w
    big = []
    markers = {}
    pos = 0
    contigs = vcf.contigs
    # reference first
    for contig in contigs:
        seq = fetch_contig(fasta_path, contig)
        recs = vcf.records_for_contig(contig)
        rid = vcf.contig_id(contig)
        m, _ = truth_markers_for_hap(recs, 0, -1, True, pos)
        for k, (rp, g) in m.items():
            markers[k] = (rid, rp, g)
        big.append(seq + pad)
        pos += len(seq) + w
    for si, sample in enumerate(samples):
        sidx = vcf.sample_index(sample)
        for hap in (0, 1):
            for contig in contigs:
                seq = fetch_contig(fasta_path, contig)
                recs = vcf.records_for_contig(contig)
                rid = vcf.contig_id(contig)
                m, bias = truth_markers_for_hap(recs, hap, sidx, False, pos)
                for k, (rp, g) in m.items():
                    markers[k] = (rid, rp, g)
                hap_seq = apply_variants(seq, recs, hap, sidx, False)
                big.append(hap_seq + pad)
                pos += len(hap_seq) + w
    big_seq = np.frombuffer(b"".join(big), dtype=np.uint8)
    sa = brute_sa(big_seq)
    n = big_seq.shape[0]
    bwt = np.where(sa == 0, np.uint8(0), big_seq[(sa - 1) % n]).astype(np.uint8)
    marker_lines = []
    for i, s in enumerate(sa):
        if int(s) in markers:
            rid, rp, g = markers[int(s)]
            marker_lines.append(f"{i} {rid} {rp} {g}")
    return big_seq, sa, bwt, markers, marker_lines
