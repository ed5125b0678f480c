"""Norms codebook for non-orthogonal MCQ search.

Non-orthogonal methods (RVQ/ERVQ/ChainQ/LSQ/SR) spend one extra code
byte on a quantized ``|x_hat|^2`` so the ADC scan can add the norm term
from a table. Capability parity with reference `src/utils.jl`
(``get_norms_codebook`` :4-26 — k-means on the scalar norms;
``quantize_norms`` :29-59 — nearest-norm assignment).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rayuela_tpu.ops.kmeans import kmeans
from rayuela_tpu.ops.qerror import reconstruct

Array = jax.Array


@partial(jax.jit, static_argnames=("h",))
def get_norms_codebook(key: Array, C: Array, B: Array, h: int = 256
                       ) -> tuple[Array, Array]:
    """k-means the decode norms. Returns ``(norms_codes (n,), norms_cbook (h,))``.

    Reference `src/utils.jl:4-26` (Clustering.kmeans on a 1 x n matrix
    of squared norms)."""
    Xhat = reconstruct(C, B)
    dbnorms = jnp.sum(Xhat * Xhat, axis=-1, keepdims=True)   # (n, 1)
    res = kmeans(key, dbnorms, h, iters=25)
    return res.assignments, res.centers.reshape(-1)


@jax.jit
def quantize_norms(C: Array, B: Array, norms_cbook: Array
                   ) -> tuple[Array, Array]:
    """Assign each decode's squared norm to its nearest codebook scalar.

    Returns ``(norm_codes (n,) int32, exact_norms (n,) f32)``.
    Reference `src/utils.jl:29-59`."""
    Xhat = reconstruct(C, B)
    norms = jnp.sum(Xhat * Xhat, axis=-1)                    # (n,)
    d2 = (norms[:, None] - norms_cbook[None, :]) ** 2
    return jnp.argmin(d2, axis=-1).astype(jnp.int32), norms
