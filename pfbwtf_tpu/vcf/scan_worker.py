"""Subprocess entry point for one haplotype scan.

The orchestrator's data parallelism is the reference's process-per-scan
design (vcf_to_bwt.py:230-237, pipe wiring :128-136) re-expressed as
explicit ``python -m pfbwtf_tpu.vcf.scan_worker`` children over a file
protocol: the parent pickles the parsed columnar VCF + config + task list
once, each worker scans one (sample, haplotype) and pickles its ScanResult
back.  This avoids fork() from a threaded parent (a latent-deadlock class
once JAX's threads exist) AND multiprocessing spawn/forkserver's
__main__ re-execution, which breaks guard-less driver scripts and
stdin/heredoc drivers.
"""

import pickle
import sys


def main(ctx_path: str, idx: str, out_path: str) -> None:
    with open(ctx_path, "rb") as f:
        vcf, cfg, tasks = pickle.load(f)
    from .pipeline import _scan_init, _scan_one

    _scan_init(vcf, cfg)
    res = _scan_one(tasks[int(idx)])
    with open(out_path, "wb") as f:
        pickle.dump(res, f, protocol=pickle.HIGHEST_PROTOCOL)


if __name__ == "__main__":
    main(*sys.argv[1:4])
