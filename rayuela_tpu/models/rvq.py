"""Residual Vector Quantization (RVQ).

Capability parity with reference `src/RVQ.jl` (``train_rvq`` :85-122,
``quantize_rvq`` :18-66): m full-dimensional codebooks trained
sequentially, each by k-means on the residual left by the previous
stages; greedy sequential encoding.

TPU-first: the stage loop is a ``lax.scan`` over the codebook axis —
each stage is one batched assignment gemm + a residual update on the
MXU/VPU. (The reference's "singletons" bookkeeping for unused centers
is replaced by deterministic cost-ranked repick inside k-means /
ERVQ — statistical parity, SURVEY.md §7.)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rayuela_tpu.ops.kmeans import assign, kmeans
from rayuela_tpu.ops.qerror import qerror
from rayuela_tpu.utils import gather_rows

Array = jax.Array


class RVQModel(NamedTuple):
    codebooks: Array  # (m, h, d) float32 — full-dimensional


@partial(jax.jit, static_argnames=("m", "h", "niter"))
def train_rvq(key: Array, X: Array, m: int, h: int = 256,
              niter: int = 25) -> tuple[RVQModel, Array, Array]:
    """Train RVQ. Returns ``(model, codes (n, m), train_error)``.

    Stage i runs a full k-means (kmeans++ init, ``niter`` Lloyd
    iterations — faiss-compatible defaults, reference
    `src/RVQ.jl:100-116`) on the residual of stages < i.
    """
    n, d = X.shape
    keys = jax.random.split(key, m)

    def stage(carry, k):
        Xr = carry
        res = kmeans(k, Xr, h, iters=niter)
        Xr = Xr - gather_rows(res.centers, res.assignments)
        return Xr, (res.centers, res.assignments)

    _, (C, B) = lax.scan(stage, X, keys)
    B = jnp.transpose(B, (1, 0)).astype(jnp.int32)        # (n, m)
    return RVQModel(codebooks=C), B, qerror(X, C, B)


@jax.jit
def quantize_rvq(model: RVQModel | Array, X: Array) -> tuple[Array, Array]:
    """Greedy sequential encoding. Returns ``(codes (n, m), residual)``.

    Reference `src/RVQ.jl:18-66` (without the singleton side-channel).
    Accepts either an RVQModel or a raw ``(m, h, d)`` codebook stack so
    ERVQ can re-encode suffixes (`src/ERVQ.jl:118`).
    """
    C = model.codebooks if isinstance(model, RVQModel) else model

    def stage(Xr, Ci):
        a, _ = assign(Xr, Ci)
        Xr = Xr - gather_rows(Ci, a)
        return Xr, a

    Xr, B = lax.scan(stage, X, C)
    return jnp.transpose(B, (1, 0)).astype(jnp.int32), Xr
