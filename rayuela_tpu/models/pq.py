"""Product Quantization (PQ) — train + encode.

Capability parity with reference `src/PQ.jl` (``train_pq`` :68-99,
``quantize_pq`` :18-48): split the d dims into m contiguous subspaces,
run an independent h-center k-means in each, encode by per-subspace
nearest-center assignment.

TPU-first: all m subspace k-means runs execute as ONE ``vmap`` over the
codebook axis — every Lloyd iteration is a single batched (m, n, ds) x
(m, h, ds) distance einsum on the MXU instead of m sequential
``Clustering.kmeans`` calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rayuela_tpu.ops.kmeans import assign, kmeans
from rayuela_tpu.ops.qerror import qerror_pq

Array = jax.Array


class PQModel(NamedTuple):
    codebooks: Array  # (m, h, d//m) float32


def _split_subspaces(X: Array, m: int) -> Array:
    """(n, d) → (m, n, ceil(d/m)) contiguous subspaces.

    Balanced ranges like the reference's ``splitarray(1:d, m)``
    (`src/PQ.jl:29,80`). When d % m != 0 (e.g. the non-orthogonal
    protocol's m-1=7 codebooks on SIFT d=128), shorter subspaces are
    zero-padded to the common width — exact for every consumer, since
    zero dims contribute zero to distances and stay zero under k-means
    center means."""
    n, d = X.shape
    if d % m == 0:
        return jnp.transpose(X.reshape(n, m, d // m), (1, 0, 2))
    from rayuela_tpu.utils import cdiv, splitarray
    ds = cdiv(d, m)
    subs = [jnp.pad(X[:, st:st + sz], ((0, 0), (0, ds - sz)))
            for st, sz in splitarray(d, m)]
    return jnp.stack(subs)


def train_pq(key: Array, X: Array, m: int, h: int = 256,
             iters: int = 25) -> tuple[PQModel, Array, Array]:
    """Train PQ. Returns ``(model, codes (n, m) int32, train_error)``.

    Defaults match the reference/faiss (25 k-means iterations,
    `src/PQ.jl:84-87`)."""
    Xs = _split_subspaces(X, m)
    keys = jax.random.split(key, m)
    res = jax.vmap(kmeans, in_axes=(0, 0, None, None))(keys, Xs, h, iters)
    model = PQModel(codebooks=res.centers)
    B = jnp.transpose(res.assignments, (1, 0)).astype(jnp.int32)
    return model, B, qerror_pq(X, model.codebooks, B)


def quantize_pq(model: PQModel, X: Array, chunk: int = 65536) -> Array:
    """Encode: per-subspace nearest-center assignment → (n, m) int32.

    Reference `src/PQ.jl:18-48`. The n axis streams in chunks so the
    (m, chunk, h) distance transient stays bounded at base-set scale
    (1M x m=8 x h=256 would otherwise be ~8 GB)."""
    from jax import lax

    from rayuela_tpu.utils import cdiv

    m = model.codebooks.shape[0]
    n = X.shape[0]
    nchunks = cdiv(n, chunk)
    Xp = jnp.pad(X, ((0, nchunks * chunk - n), (0, 0)))

    def enc(Xc):
        Xs = _split_subspaces(Xc, m)
        a, _ = jax.vmap(assign)(Xs, model.codebooks)
        return jnp.transpose(a, (1, 0)).astype(jnp.int32)

    B = lax.map(enc, Xp.reshape(nchunks, chunk, -1))
    return B.reshape(-1, m)[:n]
