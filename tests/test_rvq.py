import jax
import jax.numpy as jnp
import numpy as np

from rayuela_tpu.models.ervq import train_ervq, train_ervq_from_scratch
from rayuela_tpu.models.rvq import quantize_rvq, train_rvq
from rayuela_tpu.ops.qerror import qerror
from rayuela_tpu.search.norms import get_norms_codebook, quantize_norms


def test_rvq_error_decreases_with_stages(rng):
    X = jnp.asarray(rng.standard_normal((2000, 16)).astype(np.float32))
    errs = []
    for m in (1, 2, 4):
        _, _, e = train_rvq(jax.random.PRNGKey(0), X, m=m, h=16, niter=10)
        errs.append(float(e))
    assert errs[0] > errs[1] > errs[2]


def test_quantize_rvq_greedy_matches_numpy(rng):
    X = rng.standard_normal((200, 8)).astype(np.float32)
    C = rng.standard_normal((3, 16, 8)).astype(np.float32)
    B, Xr = quantize_rvq(jnp.asarray(C), jnp.asarray(X))
    B, Xr = np.asarray(B), np.asarray(Xr)
    # replicate greedy encoding in numpy
    res = X.copy()
    for i in range(3):
        D = ((res[:, None] - C[i][None]) ** 2).sum(-1)
        a = D.argmin(1)
        np.testing.assert_array_equal(B[:, i], a)
        res -= C[i][a]
    np.testing.assert_allclose(Xr, res, rtol=1e-4, atol=1e-5)


def test_rvq_train_encode_consistent(rng):
    X = jnp.asarray(rng.standard_normal((1000, 8)).astype(np.float32))
    model, B, err = train_rvq(jax.random.PRNGKey(1), X, m=3, h=16, niter=10)
    B2, _ = quantize_rvq(model, X)
    # greedy re-encode of training data should match training error
    err2 = float(qerror(X, model.codebooks, B2))
    assert abs(err2 - float(err)) < 1e-3


def test_ervq_improves_rvq(rng):
    X = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))
    model, B, rvq_err = train_rvq(jax.random.PRNGKey(2), X, m=4, h=16,
                                  niter=10)
    model2, B2, ervq_err = train_ervq(X, B, model.codebooks, niter=5)
    assert float(ervq_err) <= float(rvq_err) + 1e-4
    # strict improvement is expected on random data
    assert float(ervq_err) < float(rvq_err)


def test_ervq_from_scratch(rng):
    X = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    model, B, err = train_ervq_from_scratch(jax.random.PRNGKey(3), X,
                                            m=2, h=8, niter=4)
    assert B.shape == (500, 2)
    assert np.isfinite(float(err))


def test_norms_codebook_roundtrip(rng):
    X = jnp.asarray(rng.standard_normal((600, 8)).astype(np.float32))
    model, B, _ = train_rvq(jax.random.PRNGKey(4), X, m=2, h=16, niter=5)
    codes, cbook = get_norms_codebook(jax.random.PRNGKey(5),
                                      model.codebooks, B, h=16)
    ncodes, exact = quantize_norms(model.codebooks, B, cbook)
    # quantized norm must be the nearest codebook entry to the exact norm
    err_q = np.abs(np.asarray(cbook)[np.asarray(ncodes)] - np.asarray(exact))
    err_all = np.abs(np.asarray(cbook)[None, :] - np.asarray(exact)[:, None])
    np.testing.assert_allclose(err_q, err_all.min(1), rtol=1e-4, atol=1e-4)
    # and the k-means codes from training should agree with re-assignment
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ncodes))


def test_quantize_ervq_is_rvq_encoder(rng):
    """`quantize_ervq` == `quantize_rvq` (the reference forwards one to
    the other, `src/ERVQ.jl:19-26`) — ERVQ changes training only."""
    import jax
    from rayuela_tpu.models.ervq import quantize_ervq, train_ervq_from_scratch
    from rayuela_tpu.models.rvq import quantize_rvq
    X = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    model, B, _ = train_ervq_from_scratch(jax.random.PRNGKey(0), X, 3,
                                          h=16, niter=2)
    Ba, _ = quantize_ervq(model, X)
    Bb, _ = quantize_rvq(model, X)
    np.testing.assert_array_equal(np.asarray(Ba), np.asarray(Bb))
