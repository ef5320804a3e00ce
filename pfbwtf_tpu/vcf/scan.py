"""Haplotype materialization + marker emission (vcf_scan equivalent).

Reproduces scan_vcf_sample (src/vcf_scan.cpp:127-235): for each VCF-header
contig, walk records left-to-right, emit ref slice + chosen allele, track
indel bias, and stream marker positions into a MarkerPositionsWriter.
Marker placement rules (vcf_scan.cpp:180-202; validated against the
independent-oracle truth logic in scripts/generate_truth_set.py:56-80):

  SNP  (rlen==1==alen):          mark pos
  gt==0 indel (rlen!=alen):      mark pos..pos+rlen (inclusive), no bias
  deletion (rlen>alen, gt>0):    mark pos, pos+1;       bias -= rlen-1
  insertion (rlen<alen, gt>0):   mark pos..pos+alen;    bias += alen-1

where rlen/alen are len(REF)/len(ALT1) — ALT1 regardless of gt, preserving
the reference's quirk — and marked positions are seq_start + bias + ... in
haplotype text coordinates.  Overlapping records are skipped with a warning
(vcf_scan.cpp:210-213).
"""

import io
import sys
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..io.fasta import fetch_contig, write_fai
from ..markers.mps import MarkerPositionsWriter
from .reader import VCF


@dataclass
class ScanResult:
    records: List[Tuple[str, np.ndarray]] = field(default_factory=list)
    mps_bytes: bytes = b""

    def n(self, w: int) -> int:
        """Parse-time text length of this haplotype fasta (sum of contig
        lengths + w pad each) — what its .n checkpoint file holds."""
        return sum(len(s) + w for _, s in self.records)


def scan_vcf_sample(
    vcf: VCF,
    ref_fasta: str,
    sample: str,
    haplotype: int,
    w: int = 10,
    ma_wsize: int = 1,
    ref_only: bool = False,
    want_markers: bool = True,
    contigs: Optional[List[str]] = None,
) -> ScanResult:
    mps_buf = io.BytesIO()
    writer = MarkerPositionsWriter(ma_wsize, mps_buf) if want_markers else None
    out = ScanResult()
    seq_start = 0
    sample_idx = vcf.sample_index(sample) if not ref_only else -1
    contig_list = contigs if contigs else vcf.contigs
    for contig in contig_list:
        rid = vcf.contig_id(contig)
        try:
            ref_seq = fetch_contig(ref_fasta, contig)
        except KeyError:
            print(
                f"contig {contig} does not exist in fasta, skipping...",
                file=sys.stderr,
            )
            continue
        ref_len = len(ref_seq)
        header = contig if ref_only else f"{sample}.{haplotype}.{contig}"
        pieces: List[bytes] = []
        ppos_after = 0
        bias = 0
        prange = (0, 0)
        for rec in vcf.records_for_contig(contig):
            rlen = len(rec.alleles[0])
            r0, r1 = rec.pos, rec.pos + rlen
            if not (prange[1] <= r0):
                print(
                    f"Warning: skipping overlapping variant {rid}:{rec.pos} "
                    f"({rec.vid}).",
                    file=sys.stderr,
                )
                continue
            if ref_only:
                gt = 0
            else:
                gt = rec.gts[sample_idx][haplotype] if rec.gts else -1
                if gt == -1:
                    gt = 0
            if gt >= rec.n_allele:
                raise ValueError(
                    f"malformed GT in VCF (GT {gt} for record with "
                    f"{rec.n_allele} alleles)"
                )
            if writer is not None and len(rec.alleles) > 1:
                alen = len(rec.alleles[1])  # ALT1 regardless of gt (quirk)
                base = seq_start + bias + rec.pos
                if rlen == 1 and alen == 1:
                    writer.update(base, rec.pos, gt, rid)
                elif rlen != alen and gt == 0:
                    for i in range(rlen + 1):
                        writer.update(base + i, rec.pos, gt, rid)
                elif rlen > alen and gt > 0:  # deletion
                    writer.update(base, rec.pos, gt, rid)
                    writer.update(base + 1, rec.pos, gt, rid)
                    bias -= rlen - 1
                elif rlen < alen and gt > 0:  # insertion
                    for i in range(alen + 1):
                        writer.update(base + i, rec.pos, gt, rid)
                    bias += alen - 1
            # sequence: ref slice up to the record, then the chosen allele
            pieces.append(ref_seq[ppos_after : rec.pos])
            pieces.append(rec.alleles[gt].encode())
            ppos_after = rec.pos + rlen
            prange = (r0, r1)
        pieces.append(ref_seq[ppos_after:ref_len])
        if writer is not None:
            writer.finish_sequence()
        seq = np.frombuffer(b"".join(pieces), dtype=np.uint8)
        out.records.append((header, seq))
        seq_start += ref_len + w + bias
    out.mps_bytes = mps_buf.getvalue() if writer is not None else b""
    return out


def write_scan_outputs(result: ScanResult, prefix: str, w: int):
    """Persist a scan like the vcf_scan CLI does: .fa + .mps + .n."""
    from ..io.formats import write_n

    with open(prefix + ".fa", "w") as f:
        for name, seq in result.records:
            f.write(f">{name}\n")
            f.write(seq.tobytes().decode("ascii") + "\n")
    with open(prefix + ".mps", "wb") as f:
        f.write(result.mps_bytes)
    write_n(prefix + ".n", result.n(w))
