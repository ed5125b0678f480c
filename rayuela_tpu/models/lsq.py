"""LSQ — Local Search Quantization (ECCV'16), the fully-connected MCQ.

Capability parity with reference `src/LSQ.jl` (``train_lsq`` :323-372):
alternate the "fastbin" least-squares codebook update with ILS/ICM
encoding. Initialized from ChainQ (or OPQ) codes + rotation; after the
first codebook update the rotation is folded into the codebooks and
training proceeds in the original space (reference `:348-352`).

TPU-first: the whole loop is one jit; encoding is the batched gather/
argmin ICM of `rayuela_tpu.ops.icm`; the codebook solve is the
normal-equation path of `rayuela_tpu.ops.codebook_update` whose (G, F)
statistics psum across a data-sharded mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rayuela_tpu.ops.codebook_update import codebook_stats, _solve_direct
from rayuela_tpu.ops.icm import encoding_icm
from rayuela_tpu.ops.qerror import qerror

Array = jax.Array


class LSQModel(NamedTuple):
    codebooks: Array  # (m, h, d) float32, original (unrotated) space


@partial(jax.jit, static_argnames=("h", "niter", "ilsiter", "icmiter",
                                   "npert", "randord", "chunk"))
def train_lsq(key: Array, X: Array, B0: Array, R0: Array, h: int = 256,
              niter: int = 25, ilsiter: int = 8, icmiter: int = 4,
              npert: int = 4, randord: bool = True, chunk: int = 8192
              ) -> tuple[LSQModel, Array, Array]:
    """Train LSQ from init codes/rotation (usually ChainQ's).

    Returns ``(model, codes (n, m), obj (niter+1,))``. Defaults are the
    reference experiment settings
    (`demos/demos_train_query_base.jl:64-67`)."""
    n, d = X.shape
    m = B0.shape[1]

    def update_C(Xs, B):
        G, F = codebook_stats(Xs, B, h, chunk=16384)
        return _solve_direct(G, F, h, 1e-4)

    # Init: solve codebooks in the rotated frame, rotate them back, then
    # work in the original space (reference `src/LSQ.jl:346-356`).
    RX = jnp.matmul(X, R0, preferred_element_type=jnp.float32)
    C0 = update_C(RX, B0)
    C0 = jnp.einsum("de,mhe->mhd", R0, C0,
                    preferred_element_type=jnp.float32)
    B1 = encoding_icm(jax.random.fold_in(key, 0), X, C0, B0,
                      ilsiter=ilsiter, icmiter=icmiter, npert=npert,
                      randord=randord, chunk=chunk)

    def body(it, state):
        C, B, obj = state
        obj = obj.at[it].set(qerror(X, C, B))
        C = update_C(X, B)
        B = encoding_icm(jax.random.fold_in(key, it + 1), X, C, B,
                         ilsiter=ilsiter, icmiter=icmiter, npert=npert,
                         randord=randord, chunk=chunk)
        return C, B, obj

    obj0 = jnp.zeros((niter + 1,), jnp.float32)
    C, B, obj = lax.fori_loop(0, niter, body, (C0, B1, obj0))
    obj = obj.at[niter].set(qerror(X, C, B))
    return LSQModel(codebooks=C), B, obj


def quantize_lsq(key: Array, model: LSQModel, X: Array, B0: Array,
                 ilsiter: int = 32, icmiter: int = 4, npert: int = 4,
                 randord: bool = True, chunk: int = 8192) -> Array:
    """Base-set encoding: ILS/ICM from an init (typically the training
    encoder re-run or a greedy init), with the reference's 4x ILS budget
    for base vectors (`src/SR.jl:286-287`)."""
    return encoding_icm(key, X, model.codebooks, B0, ilsiter=ilsiter,
                        icmiter=icmiter, npert=npert, randord=randord,
                        chunk=chunk)
