"""Enhanced RVQ / Stacked Quantizers (ERVQ).

Capability parity with reference `src/ERVQ.jl` (``train_ervq`` :51-135):
fine-tune an RVQ model — per codebook j, recompute the target residual
with codebook j excluded, update C[j] to the per-center means of that
target (empties repicked), then greedily re-encode the suffix j..m.

TPU-first formulation: the per-j pass is a ``lax.scan`` over the
codebook axis whose body (a) excludes codebook j from the full decode
with one add-back gather instead of rebuilding prefix/suffix decodes,
and (b) re-encodes with a *masked* greedy scan over all m stages —
stages < j replay their old code, stages >= j re-assign — so one
compiled body serves every j.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from rayuela_tpu.models.rvq import RVQModel
from rayuela_tpu.ops.kmeans import assign, update_centers
from rayuela_tpu.ops.qerror import qerror, reconstruct
from rayuela_tpu.utils import gather_rows

Array = jax.Array


def _masked_reencode(C: Array, B: Array, X: Array, j: Array) -> Array:
    """Greedy sequential re-encode where stages < j keep their old code.

    Equivalent to ``B[j:] = quantize_rvq(X - decode(prefix), C[j:])``
    (reference `src/ERVQ.jl:113-118`) without shape-varying suffixes.
    """
    m, h, d = C.shape
    idx = jnp.arange(m, dtype=jnp.int32)

    def stage(Xr, inp):
        i, Ci, b_old = inp
        a_new, _ = assign(Xr, Ci)
        a = jnp.where(i < j, b_old, a_new)
        Xr = Xr - gather_rows(Ci, a)
        return Xr, a

    _, Bnew = lax.scan(stage, X, (idx, C, jnp.transpose(B, (1, 0))))
    return jnp.transpose(Bnew, (1, 0))


@partial(jax.jit, static_argnames=("niter",))
def train_ervq(X: Array, B: Array, C: Array,
               niter: int = 25) -> tuple[RVQModel, Array, Array]:
    """Fine-tune RVQ codes/codebooks. Returns ``(model, codes, error)``.

    Args: ``X (n, d)``; ``B (n, m)`` int32 initial codes; ``C (m, h, d)``
    initial codebooks (typically from ``train_rvq`` — reference
    `src/ERVQ.jl:138-148`).
    """
    m, h, d = C.shape

    def per_codebook(state, j):
        C, B = state
        Xhat = reconstruct(C, B)
        Cj = C[j]
        bj = B[:, j]
        # target for codebook j: data minus every OTHER codebook's decode
        Xd = X - Xhat + gather_rows(Cj, bj)
        Cj = update_centers(Xd, bj, h, Cj)
        C = lax.dynamic_update_index_in_dim(C, Cj, j, axis=0)
        B = _masked_reencode(C, B, X, j)
        return (C, B), None

    def iteration(_, state):
        state, _ = lax.scan(per_codebook, state,
                            jnp.arange(m, dtype=jnp.int32))
        return state

    C, B = lax.fori_loop(0, niter, iteration, (C, B.astype(jnp.int32)))
    return RVQModel(codebooks=C), B, qerror(X, C, B)


def train_ervq_from_scratch(key: Array, X: Array, m: int, h: int = 256,
                            niter: int = 25) -> tuple[RVQModel, Array, Array]:
    """RVQ init + ERVQ fine-tuning (reference `src/ERVQ.jl:138-148`)."""
    from rayuela_tpu.models.rvq import train_rvq
    model, B, _ = train_rvq(key, X, m, h, niter)
    return train_ervq(X, B, model.codebooks, niter)


def quantize_ervq(model, X: Array):
    """Encode with an ERVQ model — identical to RVQ's greedy sequential
    encoder, exactly as in the reference (`src/ERVQ.jl:19-26`, which
    forwards ``quantize_ervq`` to ``quantize_rvq``): ERVQ changes how
    the codebooks are *trained*, not how vectors are encoded."""
    from rayuela_tpu.models.rvq import quantize_rvq

    return quantize_rvq(model, X)
