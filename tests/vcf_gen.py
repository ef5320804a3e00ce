"""Random VCF generation for fuzz-style e2e testing
(scripts/random_vcf.py role, extended with indels)."""

import numpy as np

BASES = "ACGT"


def random_vcf(
    path: str,
    contigs,  # [(name, seq_bytes)]
    rng,
    nsamples: int = 2,
    density: float = 0.01,
    af: float = 0.5,
    indel_frac: float = 0.2,
    max_indel: int = 6,
    exotic_frac: float = 0.0,
):
    """``exotic_frac`` > 0 additionally injects htslib-grade edge records
    (symbolic ALTs, breakends, '*' spanning alleles, half-call and missing
    GTs) — real 1000G-derived panels contain these; the scanner must
    parse them cleanly and skip the non-sequence ones with a warning."""
    samples = [f"s{i}" for i in range(nsamples)]
    lines = ["##fileformat=VCFv4.2"]
    for name, seq in contigs:
        lines.append(f"##contig=<ID={name},length={len(seq)}>")
    lines.append('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
    lines.append(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples)
    )
    vid = 0
    for name, seq in contigs:
        L = len(seq)
        n_var = max(1, int(L * density))
        pos_pool = rng.choice(np.arange(1, L - max_indel - 2), size=n_var,
                              replace=False)
        prev_end = -1
        for pos in np.sort(pos_pool):
            pos = int(pos)
            # pos == prev_end is legal for the scanner but collides marker
            # text positions after deletions — the reference's rle loader
            # aborts on such inputs (rle_window_array.hpp:29-31), so stay in
            # supported territory; pos < prev_end exercises the
            # overlap-skip path and is safe (skipped records are inert)
            if pos == prev_end:
                continue
            ref_base = chr(seq[pos])
            if exotic_frac and rng.random() < exotic_frac:
                kind = rng.integers(0, 4)
                if kind == 0:  # symbolic ALT
                    ref = ref_base
                    alt = str(rng.choice(["<DEL>", "<INS>", "<CN0>"]))
                elif kind == 1:  # breakend
                    ref = ref_base
                    alt = f"{ref_base}[{name}:{pos + 10}["
                elif kind == 2:  # spanning-deletion allele
                    ref = ref_base
                    alt = "*"
                else:  # half-call / missing GTs on a plain SNP
                    ref = ref_base
                    alt = str(rng.choice(
                        [b for b in BASES if b != ref_base]
                    ))
                if kind == 3:
                    gts = [str(rng.choice([".|.", ".|0", "0|."]))
                           for _ in samples]
                else:
                    gts = []
                    for _ in samples:
                        h0 = 1 if rng.random() < af else 0
                        h1 = 1 if rng.random() < af else 0
                        gts.append(f"{h0}|{h1}")
                vid += 1
                lines.append(
                    f"{name}\t{pos + 1}\tx{vid}\t{ref}\t{alt}\t.\tPASS\t"
                    ".\tGT\t" + "\t".join(gts)
                )
                # non-sequence records are skipped by the scanner (and
                # half-calls fold to ref): they never advance the overlap
                # window
                continue
            if rng.random() < indel_frac:
                k = int(rng.integers(1, max_indel))
                if rng.random() < 0.5:  # deletion: REF = base + k following
                    ref = ref_base + bytes(seq[pos + 1 : pos + 1 + k]).decode()
                    alt = ref_base
                else:  # insertion
                    ins = "".join(rng.choice(list(BASES), size=k))
                    ref = ref_base
                    alt = ref_base + ins
            else:  # SNP
                ref = ref_base
                alt = rng.choice([b for b in BASES if b != ref_base])
            gts = []
            for _ in samples:
                h0 = 1 if rng.random() < af else 0
                h1 = 1 if rng.random() < af else 0
                gts.append(f"{h0}|{h1}")
            vid += 1
            lines.append(
                f"{name}\t{pos + 1}\tv{vid}\t{ref}\t{alt}\t.\tPASS\t.\tGT\t"
                + "\t".join(gts)
            )
            if pos >= prev_end:  # accepted records advance the skip window
                prev_end = pos + len(ref)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return samples
