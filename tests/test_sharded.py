"""Multi-chip sharded parse on the virtual 8-device CPU mesh: the halo
exchange + masked warm-up must reproduce the single-stream scan exactly
(the device analogue of the operator+= junction algebra)."""

import numpy as np
import pytest

from pfbwtf_tpu.ops.hash import hash_scan_np
from pfbwtf_tpu.parallel.sharded import make_parse_mesh, sharded_cut_mask
from pfbwtf_tpu.utils.tables import NTOA_TABLE


@pytest.mark.parametrize("n,w,p", [(100_000, 10, 17), (37_777, 4, 5),
                                   (8_192, 32, 100)])
def test_sharded_cut_mask_matches_stream(rng, n, w, p):
    chars = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    codes = NTOA_TABLE[chars]
    mesh = make_parse_mesh()
    assert mesh.devices.size == 8
    cut_sh, total = sharded_cut_mask(codes, w, p, mesh)
    _, _, cut_np = hash_scan_np(chars, w, p)
    assert np.array_equal(cut_sh, cut_np)
    # psum'd phrase count covers the padded tail; true cuts must agree
    assert total >= int(cut_np.sum())


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out[1]) > 0
    ge.dryrun_multichip(8)


def test_sharded_phrase_sketch_matches_stream(rng):
    """The psum'd phrase sketch (distributed dict-union skeleton) equals the
    single-stream computation."""
    from pfbwtf_tpu.ops.hash import wang_hash_np, window_kmers_np
    from pfbwtf_tpu.parallel.sharded import sharded_phrase_sketch

    n = 64_000
    chars = rng.choice(list(b"ACGT"), size=n).astype(np.uint8)
    codes = NTOA_TABLE[chars]
    mesh = make_parse_mesh()
    w, p, bits = 10, 17, 12
    sketch = sharded_phrase_sketch(codes, w, p, mesh, sketch_bits=bits)
    # single-stream oracle over the identically padded stream
    n_dev = mesh.devices.size
    shard_len = -(-n // n_dev)
    padded = np.zeros(n_dev * shard_len, dtype=np.uint8)
    padded[:n] = codes
    km = window_kmers_np(padded, w)
    h = wang_hash_np(km)
    cut = (h % np.uint64(p)) == 0
    cut[:w] = False
    bucket = (h >> np.uint64(40)).astype(np.int64) % (1 << bits)
    expect = np.bincount(bucket[cut], minlength=1 << bits)
    assert np.array_equal(sketch, expect)


def test_multihost_single_process(tmp_path, rng):
    """Single-process degenerate case of the multi-host driver: the merged
    checkpoint equals a direct parse (the N-process case is the same code
    over jax.distributed; its merge algebra is covered by test_merge)."""
    from pfbwtf_tpu.ops.parse import ParserParams, parse_fasta
    from pfbwtf_tpu.parallel.multihost import multihost_parse
    from pfbwtf_tpu.pipeline import save_parser

    fa = tmp_path / "in.fa"
    seq = "".join(np.random.default_rng(5).choice(list("ACGT"), size=4000))
    fa.write_text(f">r1\n{seq[:2000]}\n>r2\n{seq[2000:]}\n")
    params = ParserParams(w=10, p=10)
    out = str(tmp_path / "mh")
    merged = multihost_parse(str(fa), out, params, barrier=False)
    direct = parse_fasta(str(fa), params)
    ref = str(tmp_path / "direct")
    save_parser(direct, ref)
    for ext in (".dict", ".occ", ".parse", ".n"):
        assert (
            open(out + ext, "rb").read() == open(ref + ext, "rb").read()
        ), ext


def test_scaling_bench_smoke():
    from benchmarks.scaling import bench_dsort, bench_parse

    rows = bench_parse(shard_mb=0.05, w=10, p=17, iters=1)
    assert rows[0]["devices"] == 1 and rows[-1]["devices"] == 8
    assert all(r["mbps"] > 0 for r in rows)
    rows = bench_dsort(shard_mb=0.05, iters=1)
    assert rows[0]["devices"] == 1 and rows[-1]["devices"] == 8
    assert all(r["mbps"] > 0 for r in rows)
