"""Native (C++ mmap + OpenMP) xvecs reader — equivalence with the numpy
path, per the reference's cross-implementation test strategy."""

import numpy as np
import pytest

from rayuela_tpu.io import native
from rayuela_tpu.io.xvecs import fvecs_read, fvecs_write, ivecs_write

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_native_matches_numpy_reader(tmp_path, rng):
    X = rng.standard_normal((500, 24)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    fvecs_write(path, X)
    got = native.read(path, "<f4", 4)
    np.testing.assert_array_equal(got, X)
    # range read
    got = native.read(path, "<f4", 4, start=100, count=37)
    np.testing.assert_array_equal(got, X[100:137])
    # probe
    assert native.probe(path, 4) == (24, 500)


@needs_native
def test_native_write_roundtrip(tmp_path, rng):
    X = (rng.standard_normal((40, 8)) * 100).astype(np.int32)
    path = str(tmp_path / "x.ivecs")
    native.write(path, X, "<i4")
    got = native.read(path, "<i4", 4)
    np.testing.assert_array_equal(got, X)
    # and the numpy reader agrees on the same bytes
    from rayuela_tpu.io.xvecs import ivecs_read
    np.testing.assert_array_equal(ivecs_read(path, native="never"), X)


@needs_native
def test_native_rejects_corrupt_and_oob(tmp_path, rng):
    X = rng.standard_normal((20, 8)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    fvecs_write(path, X)
    with pytest.raises(ValueError):
        native.read(path, "<f4", 4, start=10, count=100)   # OOB
    # corrupt a dimension header
    raw = bytearray(open(path, "rb").read())
    raw[5 * (4 + 32)] = 99
    bad = str(tmp_path / "bad.fvecs")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        native.read(bad, "<f4", 4)
    # truncated file
    trunc = str(tmp_path / "t.fvecs")
    open(trunc, "wb").write(bytes(raw[:50]))
    with pytest.raises(ValueError):
        native.probe(trunc, 4)


@needs_native
def test_auto_routing_uses_native_for_big_files(tmp_path, rng, monkeypatch):
    """>16 MB file routes through the native reader automatically."""
    X = rng.standard_normal((140_000, 32)).astype(np.float32)  # ~18 MB
    path = str(tmp_path / "big.fvecs")
    fvecs_write(path, X)
    called = {}
    orig = native.read

    def spy(*a, **kw):
        called["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(native, "read", spy)
    got = fvecs_read(path, 5, 1000)
    assert called.get("hit")
    np.testing.assert_array_equal(got, X[5:1005])
