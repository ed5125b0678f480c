import jax
import jax.numpy as jnp
import numpy as np

from rayuela_tpu.ops.kmeans import assign, kmeans, kmeanspp_init


def blobs(rng, k=8, per=100, d=16, spread=0.05):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    X = np.repeat(centers, per, axis=0)
    X += spread * rng.standard_normal(X.shape).astype(np.float32)
    return X, centers


def test_assign_matches_numpy(rng):
    X = rng.standard_normal((200, 8)).astype(np.float32)
    C = rng.standard_normal((16, 8)).astype(np.float32)
    a, d2 = assign(jnp.asarray(X), jnp.asarray(C))
    D = ((X[:, None] - C[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(a), D.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), D.min(1), rtol=1e-4, atol=1e-4)


def test_kmeans_recovers_blobs(rng):
    X, _ = blobs(rng)
    res = kmeans(jax.random.PRNGKey(0), jnp.asarray(X), 8, iters=25)
    # Tight, well-separated blobs: objective ≈ within-blob variance.
    assert float(res.objective) < 0.1
    # All 8 clusters used.
    assert len(np.unique(np.asarray(res.assignments))) == 8


def test_kmeans_monotone_objective(rng):
    """Lloyd iterations must not increase the objective."""
    X = jnp.asarray(rng.standard_normal((500, 8)).astype(np.float32))
    objs = [float(kmeans(jax.random.PRNGKey(1), X, 16, iters=it).objective)
            for it in (1, 5, 25)]
    assert objs[0] >= objs[1] - 1e-5 >= objs[2] - 1e-5


def test_kmeanspp_picks_data_points(rng):
    X = rng.standard_normal((100, 4)).astype(np.float32)
    C = np.asarray(kmeanspp_init(jax.random.PRNGKey(2), jnp.asarray(X), 10))
    # every seeded center is an actual data row
    for c in C:
        assert np.min(np.sum((X - c) ** 2, axis=1)) < 1e-10


def test_kmeans_more_centers_than_points_ok(rng):
    """Empty-cluster repick keeps k > #distinct points from NaNing."""
    X = jnp.asarray(np.tile(rng.standard_normal((4, 4)).astype(np.float32),
                            (5, 1)))
    res = kmeans(jax.random.PRNGKey(3), X, 8, iters=5)
    assert np.all(np.isfinite(np.asarray(res.centers)))


def test_kmeans_vmap_over_subspaces(rng):
    """PQ trains m subspaces as one vmap — must be identical to looping."""
    Xs = jnp.asarray(rng.standard_normal((3, 200, 8)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    batched = jax.vmap(kmeans, in_axes=(0, 0, None, None))(keys, Xs, 16, 5)
    for i in range(3):
        single = kmeans(keys[i], Xs[i], 16, iters=5)
        np.testing.assert_allclose(np.asarray(batched.centers[i]),
                                   np.asarray(single.centers),
                                   rtol=1e-4, atol=1e-5)
