"""Minimal VCF reader (vcf_scanner.hpp equivalent).

The reference links htslib for VCF/BCF decoding (vcf_scanner.hpp:9-13).
This environment has no htslib/pysam, so we parse the VCF text format
directly; .vcf.gz (bgzip = concatenated gzip members) is handled by
Python's zlib-backed gzip module.  Covers what the pipeline needs: header
contigs (bcf_hdr_seqnames order), sample list, per-record alleles and GT.
"""

import gzip
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple


@dataclass
class VCFRecord:
    contig: str
    pos: int  # 0-based (like htslib rec->pos)
    vid: str
    alleles: List[str]  # [ref, alt1, alt2, ...]
    gts: List[List[int]]  # per sample, per haplotype; -1 = missing

    @property
    def n_allele(self) -> int:
        return len(self.alleles)


class VCF:
    def __init__(self, fname: str):
        self.fname = fname
        self.contigs: List[str] = []  # header ##contig order
        self.samples: List[str] = []
        self._records: Dict[str, List[VCFRecord]] = {}
        self._parse(fname)

    def _open(self, fname: str):
        raw = open(fname, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)
        return raw.decode("utf-8", "replace")

    def _parse(self, fname: str):
        text = self._open(fname)
        contig_seen: List[str] = []
        for line in text.splitlines():
            if not line:
                continue
            if line.startswith("##"):
                if line.startswith("##contig="):
                    # ##contig=<ID=name,length=...>
                    inner = line[len("##contig=<") :].rstrip(">")
                    for fieldkv in inner.split(","):
                        if fieldkv.startswith("ID="):
                            self.contigs.append(fieldkv[3:])
                continue
            if line.startswith("#CHROM"):
                cols = line.split("\t")
                self.samples = cols[9:] if len(cols) > 9 else []
                continue
            cols = line.split("\t")
            if len(cols) < 8:
                continue
            contig = cols[0]
            pos = int(cols[1]) - 1
            vid = cols[2]
            ref = cols[3]
            alts = cols[4].split(",") if cols[4] not in (".", "") else []
            fmt = cols[8].split(":") if len(cols) > 8 else []
            gt_idx = fmt.index("GT") if "GT" in fmt else -1
            gts: List[List[int]] = []
            for s in cols[9:]:
                if gt_idx < 0:
                    gts.append([-1, -1])
                    continue
                parts = s.split(":")
                gt_str = parts[gt_idx] if gt_idx < len(parts) else "."
                hap = []
                for tok in gt_str.replace("|", "/").split("/"):
                    try:
                        hap.append(int(tok))
                    except ValueError:
                        hap.append(-1)
                # haploid record: reuse the single value (vcf_scanner.hpp:34-36)
                if len(hap) == 1:
                    hap = [hap[0], hap[0]]
                gts.append(hap)
            rec = VCFRecord(contig, pos, vid, [ref] + alts, gts)
            self._records.setdefault(contig, []).append(rec)
            if contig not in contig_seen:
                contig_seen.append(contig)
        if not self.contigs:
            self.contigs = contig_seen

    def records_for_contig(self, contig: str) -> List[VCFRecord]:
        return self._records.get(contig, [])

    def contig_id(self, contig: str) -> int:
        """bcf_hdr_name2id equivalent: index in header contig order."""
        return self.contigs.index(contig)

    def sample_index(self, sample: str) -> int:
        return self.samples.index(sample)


def merge_vcfs(fnames: List[str]) -> "VCF":
    """Multi-VCF support (the reference's synced reader takes a list;
    tests use one file).  Records are concatenated per contig and sorted by
    position; samples must agree or be disjoint per file."""
    base = VCF(fnames[0])
    for extra in fnames[1:]:
        v = VCF(extra)
        for c in v.contigs:
            if c not in base.contigs:
                base.contigs.append(c)
            base._records.setdefault(c, []).extend(v.records_for_contig(c))
        for s in v.samples:
            if s not in base.samples:
                base.samples.append(s)
    for c in base._records:
        base._records[c].sort(key=lambda r: r.pos)
    return base
