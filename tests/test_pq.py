import jax
import jax.numpy as jnp
import numpy as np

from rayuela_tpu.models.pq import quantize_pq, train_pq
from rayuela_tpu.ops.qerror import qerror_pq


def test_train_pq_end_to_end(rng):
    X = jnp.asarray(rng.standard_normal((2000, 32)).astype(np.float32))
    model, B, err = train_pq(jax.random.PRNGKey(0), X, m=4, h=16, iters=10)
    assert model.codebooks.shape == (4, 16, 8)
    assert B.shape == (2000, 4)
    # PQ on gaussian data with 4x16 centers should cut error well below
    # the data variance (|x|^2 mean ≈ 32).
    assert float(err) < 32.0 * 0.9

    # encode is consistent with training assignment
    B2 = quantize_pq(model, X)
    np.testing.assert_array_equal(np.asarray(B), np.asarray(B2))


def test_quantize_pq_is_argmin(rng):
    X = rng.standard_normal((100, 16)).astype(np.float32)
    model, _, _ = train_pq(jax.random.PRNGKey(1),
                           jnp.asarray(rng.standard_normal((500, 16),
                                       ).astype(np.float32)),
                           m=2, h=8, iters=5)
    B = np.asarray(quantize_pq(model, jnp.asarray(X)))
    C = np.asarray(model.codebooks)
    for s in range(2):
        Xs = X[:, s * 8:(s + 1) * 8]
        D = ((Xs[:, None] - C[s][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(B[:, s], D.argmin(1))


def test_pq_error_decreases_with_h(rng):
    X = jnp.asarray(rng.standard_normal((1500, 16)).astype(np.float32))
    errs = []
    for h in (4, 16, 64):
        _, _, e = train_pq(jax.random.PRNGKey(2), X, m=2, h=h, iters=10)
        errs.append(float(e))
    assert errs[0] > errs[1] > errs[2]
