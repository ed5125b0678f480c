"""Reconstruction / qerror ops vs independent numpy implementations —
the reference's cross-implementation equivalence style (`test/chainq.jl`)."""

import jax.numpy as jnp
import numpy as np

from rayuela_tpu.ops import qerror as Q
from tests.conftest import random_dataset


def np_reconstruct(C, B):
    n, m = B.shape
    out = np.zeros((n, C.shape[2]), np.float32)
    for i in range(m):
        out += C[i][B[:, i]]
    return out


def np_reconstruct_pq(C, B):
    n, m = B.shape
    return np.concatenate([C[i][B[:, i]] for i in range(m)], axis=1)


def test_reconstruct_additive(rng):
    X, C, B = random_dataset(rng)
    got = np.asarray(Q.reconstruct(jnp.asarray(C), jnp.asarray(B)))
    np.testing.assert_allclose(got, np_reconstruct(C, B), rtol=1e-5)


def test_reconstruct_pq(rng):
    X, C, B = random_dataset(rng, pq=True)
    got = np.asarray(Q.reconstruct_pq(jnp.asarray(C), jnp.asarray(B)))
    np.testing.assert_allclose(got, np_reconstruct_pq(C, B), rtol=1e-5)


def test_qerror_matches_numpy(rng):
    X, C, B = random_dataset(rng)
    want = np.mean(np.sum((X - np_reconstruct(C, B)) ** 2, axis=1))
    got = float(Q.qerror(jnp.asarray(X), jnp.asarray(C), jnp.asarray(B)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_unaries_binaries(rng):
    X, C, B = random_dataset(rng, n=50, m=3, h=8)
    U = np.asarray(Q.get_unaries(jnp.asarray(X), jnp.asarray(C)))
    # unary_i(v, k) = |c|^2 - 2 c.x  (reference src/utils.jl:121-149)
    want = (np.sum(C ** 2, -1)[None] -
            2.0 * np.einsum("nd,mhd->nmh", X, C))
    np.testing.assert_allclose(U, want, rtol=1e-4, atol=1e-4)

    Bn = np.asarray(Q.get_binaries(jnp.asarray(C)))
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(Bn[i, j], 2.0 * C[i] @ C[j].T,
                                       rtol=1e-4, atol=1e-4)


def test_full_cost_equals_unary_plus_binaries(rng):
    """The MRF decomposition the ICM encoder relies on:
    |x - x_hat|^2 = |x|^2 + sum_i unary_i[B_i] + sum_{i<j} binaries[i,j][B_i,B_j]."""
    X, C, B = random_dataset(rng, n=20, m=3, h=8)
    cost = np.asarray(Q.veccost(jnp.asarray(X), jnp.asarray(C),
                                jnp.asarray(B)))
    U = np.asarray(Q.get_unaries(jnp.asarray(X), jnp.asarray(C)))
    Bi = np.asarray(Q.get_binaries(jnp.asarray(C)))
    n, m = B.shape
    want = np.sum(X ** 2, axis=1)
    for v in range(n):
        for i in range(m):
            want[v] += U[v, i, B[v, i]]
            for j in range(i + 1, m):
                want[v] += Bi[i, j][B[v, i], B[v, j]]
    np.testing.assert_allclose(cost, want, rtol=1e-3, atol=1e-3)
