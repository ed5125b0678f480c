"""Edge-case coverage: evaluation semantics, balanced splits, norms
quantization, scan boundary conditions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_eval_recall_semantics():
    from rayuela_tpu.search.linscan import eval_recall
    # query 0: NN at rank 0; query 1: rank 2; query 2: absent
    ids = np.array([[7, 1, 2], [5, 6, 9], [1, 2, 3]])
    gt = np.array([7, 9, 99])
    curve = eval_recall(ids, gt, verbose=False)
    np.testing.assert_allclose(curve, [1 / 3, 1 / 3, 2 / 3])


def test_eval_recall_monotone_and_bounded(rng):
    from rayuela_tpu.search.linscan import eval_recall
    ids = rng.integers(0, 50, (20, 10))
    gt = rng.integers(0, 50, 20)
    curve = eval_recall(ids, gt, verbose=False)
    assert (np.diff(curve) >= 0).all()
    assert 0 <= curve[0] <= curve[-1] <= 1


def test_splitarray_balanced():
    from rayuela_tpu.utils import splitarray
    for n, p in [(128, 7), (10, 3), (5, 5), (7, 2)]:
        parts = splitarray(n, p)
        sizes = [sz for _, sz in parts]
        assert sum(sizes) == n
        assert max(sizes) - min(sizes) <= 1
        # contiguous, ordered coverage
        pos = 0
        for st, sz in parts:
            assert st == pos
            pos += sz


def test_norms_quantization_roundtrip(rng):
    """Quantized norms must be the nearest codebook scalar to the exact
    decode norms."""
    from rayuela_tpu.search.norms import get_norms_codebook, quantize_norms
    from rayuela_tpu.ops.qerror import reconstruct
    from tests.conftest import random_dataset
    X, C, B = random_dataset(rng, d=12, n=400, m=3, h=8)
    codes, cbook = get_norms_codebook(jax.random.PRNGKey(0),
                                      jnp.asarray(C), jnp.asarray(B),
                                      h=8)
    qcodes, exact = quantize_norms(jnp.asarray(C), jnp.asarray(B), cbook)
    exact_ref = (np.asarray(reconstruct(C, B)) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(exact), exact_ref,
                               rtol=1e-4, atol=1e-3)
    d2 = (exact_ref[:, None] - np.asarray(cbook)[None, :]) ** 2
    np.testing.assert_array_equal(np.asarray(qcodes), d2.argmin(1))


def test_scan_single_tile_and_k_equals_n(rng):
    from rayuela_tpu.search.linscan import scan_topk
    X = rng.standard_normal((50, 8)).astype(np.float32)
    C = rng.standard_normal((2, 4, 8)).astype(np.float32)
    B = rng.integers(0, 4, (50, 2)).astype(np.int32)
    Q = rng.standard_normal((3, 8)).astype(np.float32)
    d, i = scan_topk(jnp.asarray(Q), jnp.asarray(C), jnp.asarray(B),
                     k=500, tile=128)      # k > n must clamp to n
    assert i.shape == (3, 50)
    assert np.isfinite(np.asarray(d)).all()
    assert len(set(np.asarray(i)[0].tolist())) == 50  # a permutation


def test_kmeans_more_centers_than_points(rng):
    """k > #distinct points must not produce NaN centers."""
    from rayuela_tpu.ops.kmeans import kmeans
    X = jnp.asarray(np.repeat(rng.standard_normal((3, 4)), 5,
                              axis=0).astype(np.float32))
    res = kmeans(jax.random.PRNGKey(0), X, k=8, iters=5)
    assert np.isfinite(np.asarray(res.centers)).all()
    assert float(res.objective) < 1e-6      # every point exactly covered
