"""AOT executable store (pfbwtf_tpu/aot.py): save/load round-trip,
code-digest invalidation, and fallback behavior."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfbwtf_tpu import aot


@pytest.fixture
def aot_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "aot")
    os.makedirs(d)
    monkeypatch.setenv("PFBWT_AOT_DIR", d)
    monkeypatch.setenv("PFBWT_AOT_SAVE", "1")
    return d


def _make_jit(scale):
    return jax.jit(lambda x, n: (jnp.sum(x * scale) + n, x[:4] + scale))


def test_roundtrip(aot_dir):
    x = np.arange(256, dtype=np.int64)
    args = (x, jnp.int64(7))
    cache = {}
    fn = aot.maybe_aot("t1", ("cfg", 3), lambda: _make_jit(3), args, cache)
    r1 = fn(*args)
    blobs = [f for f in os.listdir(aot_dir) if f.endswith(".aot")]
    assert len(blobs) == 1, "executable not serialized"
    # a fresh process is simulated by an empty memo cache: the blob loads
    cache2 = {}
    fn2 = aot.maybe_aot("t1", ("cfg", 3), lambda: _make_jit(3), args,
                        cache2)
    r2 = fn2(*args)
    assert int(np.asarray(r1[0])) == int(np.asarray(r2[0]))
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))


def test_shape_or_config_change_misses(aot_dir):
    x = np.arange(256, dtype=np.int64)
    args = (x, jnp.int64(7))
    aot.maybe_aot("t2", ("cfg", 3), lambda: _make_jit(3), args, {})
    n0 = len(os.listdir(aot_dir))
    # different static config -> new blob
    aot.maybe_aot("t2", ("cfg", 4), lambda: _make_jit(4), args, {})
    # different shapes -> new blob
    y = np.arange(512, dtype=np.int64)
    aot.maybe_aot("t2", ("cfg", 3), lambda: _make_jit(3),
                  (y, jnp.int64(7)), {})
    assert len(os.listdir(aot_dir)) == n0 + 2


def test_source_digest_invalidates(aot_dir, monkeypatch):
    x = np.arange(64, dtype=np.int64)
    args = (x, jnp.int64(1))
    aot.maybe_aot("t3", ("c",), lambda: _make_jit(2), args, {})
    path0 = [f for f in os.listdir(aot_dir) if f.startswith("t3-")]
    # simulate a source change: the digest cache is module-level
    monkeypatch.setattr(aot, "_src_digest_cache", "deadbeefdeadbeef")
    fn = aot.try_load("t3", ("c",), args)
    assert fn is None, "stale blob must not load after a source change"
    aot.maybe_aot("t3", ("c",), lambda: _make_jit(2), args, {})
    path1 = [f for f in os.listdir(aot_dir) if f.startswith("t3-")]
    assert len(path1) == len(path0) + 1


def test_disabled_dir_falls_back_to_jit(monkeypatch, tmp_path):
    monkeypatch.setenv("PFBWT_AOT_DIR", "")
    x = np.arange(32, dtype=np.int64)
    args = (x, jnp.int64(0))
    cache = {}
    fn = aot.maybe_aot("t4", (), lambda: _make_jit(5), args, cache)
    r = fn(*args)
    assert int(np.asarray(r[0])) == 5 * int(x.sum())


def test_corrupt_blob_falls_back(aot_dir):
    x = np.arange(32, dtype=np.int64)
    args = (x, jnp.int64(0))
    aot.maybe_aot("t5", (), lambda: _make_jit(1), args, {})
    blob = [f for f in os.listdir(aot_dir) if f.startswith("t5-")][0]
    with open(os.path.join(aot_dir, blob), "wb") as fh:
        fh.write(b"garbage")
    fn = aot.maybe_aot("t5", (), lambda: _make_jit(1), args, {})
    r = fn(*args)  # jit fallback still works
    assert int(np.asarray(r[0])) == int(x.sum())
