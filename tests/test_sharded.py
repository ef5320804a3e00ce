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
