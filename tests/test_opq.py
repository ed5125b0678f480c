import jax
import jax.numpy as jnp
import numpy as np

from rayuela_tpu.models.opq import OPQModel, quantize_opq, train_opq
from rayuela_tpu.models.pq import train_pq
from rayuela_tpu.ops.qerror import qerror_opq


def test_opq_objective_decreases(rng):
    X = jnp.asarray(rng.standard_normal((2000, 32)).astype(np.float32))
    model, B, obj = train_opq(jax.random.PRNGKey(0), X, m=4, h=16, niter=15)
    obj = np.asarray(obj)
    # alternating minimization: overall objective must trend down
    assert obj[-1] < obj[0]
    # monotone non-increasing up to tiny fp slack
    assert np.all(np.diff(obj) < 1e-3)


def test_opq_rotation_is_orthonormal(rng):
    X = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    model, _, _ = train_opq(jax.random.PRNGKey(1), X, m=2, h=8, niter=5)
    R = np.asarray(model.R)
    np.testing.assert_allclose(R.T @ R, np.eye(16), atol=1e-4)


def test_opq_beats_pq_on_correlated_data(rng):
    """OPQ's raison d'etre: on strongly correlated dims a learned
    rotation must reduce the quantization error vs plain PQ."""
    n, d = 3000, 16
    # correlated data: random low-rank mixing
    Z = rng.standard_normal((n, d)).astype(np.float32)
    M = rng.standard_normal((d, d)).astype(np.float32)
    M[:, : d // 2] *= 4.0  # anisotropic
    X = jnp.asarray((Z @ M).astype(np.float32))
    _, _, pq_err = train_pq(jax.random.PRNGKey(2), X, m=4, h=16, iters=20)
    model, B, obj = train_opq(jax.random.PRNGKey(2), X, m=4, h=16, niter=20,
                              init="random")
    assert float(obj[-1]) < float(pq_err)


def test_quantize_opq_consistent_with_training(rng):
    X = jnp.asarray(rng.standard_normal((800, 16)).astype(np.float32))
    model, B, obj = train_opq(jax.random.PRNGKey(3), X, m=2, h=8, niter=8)
    err_train = float(obj[-1])
    B2 = quantize_opq(model, X)
    err2 = float(qerror_opq(X, model.codebooks, B2, model.R))
    # re-encoding the training data can only match-or-improve the decode
    assert err2 <= err_train + 1e-4
