"""ChainQ — chain-restricted Tree Quantization with Viterbi encoding.

Capability parity with reference `src/ChainQ.jl` (``train_chainq``
:373-431, ``quantize_chainq`` :305-348): full-dimensional codebooks
whose supports overlap in a chain (dim ranges from
`rayuela_tpu.ops.codebook_update.chain_dims`), trained by alternating a
rotation update (SVD of the data/decode cross-covariance), the chain
blockwise codebook update, and exact Viterbi re-encoding. Typically
initialized from OPQ.

TPU-first: the whole alternation is one jit; encoding is the batched
`lax.scan` Viterbi of `rayuela_tpu.ops.viterbi` instead of the
reference's per-vector Julia/C++/CUDA dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rayuela_tpu.models.opq import OPQModel
from rayuela_tpu.ops.codebook_update import codebook_stats, _chain_solve
from rayuela_tpu.ops.qerror import qerror, reconstruct
from rayuela_tpu.ops.viterbi import viterbi_encode

Array = jax.Array


class ChainQModel(NamedTuple):
    codebooks: Array  # (m, h, d) float32 — chain-supported full-dim
    R: Array          # (d, d) float32 rotation


@partial(jax.jit, static_argnames=("h", "niter", "chunk"))
def train_chainq(X: Array, B0: Array, R0: Array, h: int = 256,
                 niter: int = 25, chunk: int = 2048
                 ) -> tuple[ChainQModel, Array, Array]:
    """Train ChainQ from init codes/rotation (usually OPQ's).

    Returns ``(model, codes (n, m), obj (niter+1,))``.
    Reference `src/ChainQ.jl:373-431`: per iteration — objective, R from
    SVD of X^T X_hat, chain codebook update on the rotated data, Viterbi
    re-encode."""
    n, d = X.shape
    m = B0.shape[1]

    def update_C(RX, B):
        G, F = codebook_stats(RX, B, h, chunk=16384)
        return _chain_solve(G, F, h=h, d=d, m=m, rho=1e-4)

    # Init: codebooks from codes, then re-encode (reference :396-403).
    RX0 = jnp.matmul(X, R0, preferred_element_type=jnp.float32)
    C0 = update_C(RX0, B0)
    B1 = viterbi_encode(RX0, C0, chunk=chunk)

    def body(it, state):
        C, B, R, obj = state
        RX = jnp.matmul(X, R, preferred_element_type=jnp.float32)
        obj = obj.at[it].set(qerror(RX, C, B))
        Xhat = reconstruct(C, B)                          # decode, (n, d)
        U, _, Vt = jnp.linalg.svd(
            jnp.matmul(X.T, Xhat, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST),
            full_matrices=False)
        R = jnp.matmul(U, Vt, preferred_element_type=jnp.float32)
        RX = jnp.matmul(X, R, preferred_element_type=jnp.float32)
        C = update_C(RX, B)
        B = viterbi_encode(RX, C, chunk=chunk)
        return C, B, R, obj

    obj0 = jnp.zeros((niter + 1,), jnp.float32)
    C, B, R, obj = lax.fori_loop(0, niter, body, (C0, B1, R0, obj0))
    RX = jnp.matmul(X, R, preferred_element_type=jnp.float32)
    obj = obj.at[niter].set(qerror(RX, C, B))
    return ChainQModel(codebooks=C, R=R), B, obj


def train_chainq_from_opq(X: Array, opq: OPQModel, B_opq: Array,
                          h: int = 256, niter: int = 25,
                          chunk: int = 2048):
    """Convenience wrapper matching the reference pipeline stage
    OPQ → ChainQ (`demos/demos_train_query_base.jl:56-58`)."""
    return train_chainq(X, B_opq, opq.R, h=h, niter=niter, chunk=chunk)


def quantize_chainq(model: ChainQModel, X: Array,
                    chunk: int = 2048) -> Array:
    """Encode new data: rotate, then exact Viterbi. Reference
    `src/ChainQ.jl:305-348`."""
    RX = jnp.matmul(X, model.R, preferred_element_type=jnp.float32)
    return viterbi_encode(RX, model.codebooks, chunk=chunk)
