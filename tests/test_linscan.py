"""ADC scan equivalence vs brute-force numpy LUT scan (the reference's
cross-implementation testing style, `test/chainq.jl:27-39`)."""

import jax.numpy as jnp
import numpy as np

from rayuela_tpu.search.linscan import (eval_recall, linscan_cq, linscan_lsq,
                                        linscan_opq, linscan_pq, scan_topk)
from tests.conftest import random_dataset


def np_lut_scan_pq(Q, C, B):
    """Per-subspace squared-distance LUT accumulation — exactly
    deps/src/linscan_aqd.cpp:66-89."""
    nq, n, (m, h, ds) = Q.shape[0], B.shape[0], C.shape
    out = np.zeros((nq, n), np.float32)
    for i in range(m):
        qs = Q[:, i * ds:(i + 1) * ds]
        lut = ((qs[:, None] - C[i][None]) ** 2).sum(-1)   # (nq, h)
        out += lut[:, B[:, i]]
    return out


def np_lut_scan_full(Q, C, B, dbnorms):
    """Dot-product LUTs + dbnorms — linscan_aqd_pairwise_byte.cpp:14-94."""
    nq, n, m = Q.shape[0], B.shape[0], B.shape[1]
    out = np.tile(dbnorms[None], (nq, 1)).astype(np.float32)
    for i in range(m):
        lut = -2.0 * Q @ C[i].T
        out += lut[:, B[:, i]]
    return out


def test_scan_pq_matches_lut(rng):
    X, C, B = random_dataset(rng, d=16, n=500, m=4, h=8, pq=True)
    Q = rng.standard_normal((20, 16)).astype(np.float32)
    want = np_lut_scan_pq(Q, C, B)
    d, i = linscan_pq(jnp.asarray(C), jnp.asarray(Q), jnp.asarray(B),
                      k=500, tile=128)
    d, i = np.asarray(d), np.asarray(i)
    order = np.argsort(want, axis=1, kind="stable")
    # distances of returned ids match the LUT scan's
    np.testing.assert_allclose(d, np.take_along_axis(want, i, axis=1),
                               rtol=1e-4, atol=1e-3)
    # the best-scoring id agrees
    np.testing.assert_array_equal(i[:, 0], order[:, 0])
    # sorted distance values agree across the whole scan
    np.testing.assert_allclose(np.sort(d, 1),
                               np.take_along_axis(want, order, 1),
                               rtol=1e-4, atol=1e-3)


def test_scan_lsq_matches_lut_with_norms(rng):
    X, C, B = random_dataset(rng, d=16, n=300, m=4, h=8)
    Q = rng.standard_normal((10, 16)).astype(np.float32)
    norms_cbook = np.abs(rng.standard_normal(8)).astype(np.float32)
    norms_codes = rng.integers(0, 8, size=300).astype(np.int32)
    dbnorms = norms_cbook[norms_codes]
    want = np_lut_scan_full(Q, C, B, dbnorms)
    d, i = linscan_lsq(jnp.asarray(C), jnp.asarray(Q), jnp.asarray(B),
                       jnp.asarray(norms_cbook), jnp.asarray(norms_codes),
                       k=300, tile=128)
    d, i = np.asarray(d), np.asarray(i)
    # scan_topk adds |q|^2 (constant per query) — remove before comparing
    d = d - (Q ** 2).sum(1, keepdims=True)
    np.testing.assert_allclose(d, np.take_along_axis(want, i, axis=1),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(i[:, 0], want.argmin(1))


def test_scan_cq_ranking(rng):
    X, C, B = random_dataset(rng, d=16, n=200, m=3, h=8)
    Q = rng.standard_normal((10, 16)).astype(np.float32)
    # CQ LUT: sum_i |q - C_i[B_i]|^2
    want = np.zeros((10, 200), np.float32)
    for i in range(3):
        lut = ((Q[:, None] - C[i][None]) ** 2).sum(-1)
        want += lut[:, B[:, i]]
    d, i = linscan_cq(jnp.asarray(C), jnp.asarray(Q), jnp.asarray(B),
                      k=200, tile=64)
    d, i = np.asarray(d), np.asarray(i)
    np.testing.assert_allclose(d, np.take_along_axis(want, i, axis=1),
                               rtol=1e-4, atol=1e-3)


def test_opq_scan_rotates_queries(rng):
    X, C, B = random_dataset(rng, d=16, n=200, m=4, h=8, pq=True)
    Q = rng.standard_normal((5, 16)).astype(np.float32)
    Rm = np.linalg.qr(rng.standard_normal((16, 16)))[0].astype(np.float32)
    d1, i1 = linscan_opq(jnp.asarray(C), jnp.asarray(Q), jnp.asarray(B),
                         jnp.asarray(Rm), k=50, tile=64)
    d2, i2 = linscan_pq(jnp.asarray(C), jnp.asarray(Q @ Rm),
                        jnp.asarray(B), k=50, tile=64)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_scan_handles_unpadded_n(rng):
    X, C, B = random_dataset(rng, d=8, n=333, m=2, h=8)
    Q = rng.standard_normal((4, 8)).astype(np.float32)
    d, i = scan_topk(jnp.asarray(Q), jnp.asarray(C), jnp.asarray(B),
                     k=333, tile=128)
    assert np.all(np.asarray(i) < 333)
    assert np.all(np.isfinite(np.asarray(d)))


def test_eval_recall():
    gt = np.array([3, 7, 9])
    ids = np.array([[3, 1, 2],    # hit at rank 1
                    [1, 7, 2],    # hit at rank 2
                    [1, 2, 4]])   # miss
    curve = eval_recall(ids, gt, verbose=False)
    np.testing.assert_allclose(curve, [1 / 3, 2 / 3, 2 / 3])
