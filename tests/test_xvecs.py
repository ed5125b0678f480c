"""xvecs roundtrip tests — reference `test/xvecs.jl:3-19`."""

import numpy as np

from rayuela_tpu.io import xvecs


def test_fvecs_roundtrip(tmp_path, rng):
    X = rng.standard_normal((17, 5)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    xvecs.fvecs_write(p, X)
    np.testing.assert_array_equal(xvecs.fvecs_read(p), X)


def test_ivecs_roundtrip(tmp_path, rng):
    X = rng.integers(-100, 100, size=(9, 7)).astype(np.int32)
    p = str(tmp_path / "x.ivecs")
    xvecs.ivecs_write(p, X)
    np.testing.assert_array_equal(xvecs.ivecs_read(p), X)


def test_bvecs_roundtrip(tmp_path, rng):
    X = rng.integers(0, 256, size=(4, 128)).astype(np.uint8)
    p = str(tmp_path / "x.bvecs")
    xvecs.bvecs_write(p, X)
    np.testing.assert_array_equal(xvecs.bvecs_read(p), X)


def test_range_read(tmp_path, rng):
    X = rng.standard_normal((100, 8)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    xvecs.fvecs_write(p, X)
    np.testing.assert_array_equal(xvecs.fvecs_read(p, start=10, count=20),
                                  X[10:30])
    np.testing.assert_array_equal(xvecs.fvecs_read(p, start=95), X[95:])
