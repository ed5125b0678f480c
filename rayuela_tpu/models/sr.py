"""LSQ++ — stochastic relaxations SR-C / SR-D on top of LSQ (ECCV'18).

Capability parity with reference `src/SR.jl` (``train_sr`` :4-84,
``train_sr_cuda`` :88-175 — identical math, different encoder backend;
here there is only one batched encoder) and `src/SR_perturbations.jl`
(``apply_schedule`` :4-24, ``SR_D_perturb`` :27-49, ``SR_C_perturb``
:52-73).

SR-C adds annealed Gaussian noise to the (rotated) data before each
codebook update; SR-D adds annealed noise to the updated codebooks
before each encoding. Training runs in the rotated frame and the
rotation is folded into the codebooks at the end (reference
`src/SR.jl:78-80`), so search needs no separate R.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rayuela_tpu.models.lsq import LSQModel
from rayuela_tpu.ops.codebook_update import codebook_stats, _solve_direct
from rayuela_tpu.ops.icm import encoding_icm
from rayuela_tpu.ops.qerror import qerror

Array = jax.Array


def apply_schedule(stdev: Array, it: Array | int, niter: int,
                   schedule: int = 1, p: float = 0.5) -> Array:
    """Annealing schedules 1-3 (reference `SR_perturbations.jl:4-24`):
    1: (1 - i/n)^p;  2: 1/(1+i)^p;  3: p^(i/2)."""
    it = jnp.asarray(it, jnp.float32)
    if schedule == 1:
        # XLA lowers pow via exp(p*log(x)) → NaN at x=0 (the final
        # iteration); guard the zero explicitly.
        base = jnp.maximum(1.0 - it / niter, 0.0)
        return stdev * jnp.where(base > 0, base ** p, 0.0)
    if schedule == 2:
        return stdev / (1.0 + it) ** p
    if schedule == 3:
        return stdev * p ** (it / 2.0)
    raise ValueError(f"unknown schedule {schedule}")


def sr_d_perturb(key: Array, C: Array, it, niter: int,
                 schedule: int = 1, p: float = 0.5) -> Array:
    """SR-D: add per-dimension annealed Gaussian noise to the codebooks;
    the base std is the per-dim std of all m*h codewords divided by m
    (reference `SR_perturbations.jl:27-49`)."""
    m, h, d = C.shape
    stdc = jnp.std(C.reshape(m * h, d), axis=0) / m       # (d,)
    stdc = apply_schedule(stdc, it, niter, schedule, p)
    return C + jax.random.normal(key, C.shape, C.dtype) * stdc


def sr_c_perturb(key: Array, X: Array, it, niter: int,
                 schedule: int = 1, p: float = 0.5) -> Array:
    """SR-C: add per-dimension annealed Gaussian noise to the data
    (reference `SR_perturbations.jl:52-73`)."""
    stdx = jnp.std(X, axis=0)                             # (d,)
    stdx = apply_schedule(stdx, it, niter, schedule, p)
    return X + jax.random.normal(key, X.shape, X.dtype) * stdx


@partial(jax.jit, static_argnames=("h", "niter", "ilsiter", "icmiter",
                                   "npert", "randord", "method",
                                   "schedule", "p", "chunk"))
def train_sr(key: Array, X: Array, B0: Array, R0: Array, h: int = 256,
             niter: int = 25, ilsiter: int = 8, icmiter: int = 4,
             npert: int = 4, randord: bool = True,
             method: str = "SR_D", schedule: int = 1, p: float = 0.5,
             chunk: int = 8192) -> tuple[LSQModel, Array, Array]:
    """Train LSQ++ (SR-C or SR-D) from init codes/rotation (usually
    ChainQ's). Returns ``(model, codes, obj (niter+1,))`` with the
    rotation folded into the final codebooks.

    Reference `src/SR.jl:4-175`; defaults = the reference experiments
    (`demos/demos_train_query_base.jl:64-67,77-78`)."""
    if method not in ("SR_C", "SR_D"):
        raise ValueError(f"unknown SR method {method!r}")
    n, d = X.shape
    m = B0.shape[1]
    RX = jnp.matmul(X, R0, preferred_element_type=jnp.float32)

    def update_C(Xs, B):
        G, F = codebook_stats(Xs, B, h, chunk=16384)
        return _solve_direct(G, F, h, 1e-4)

    def sr_step(kc, B, it):
        """Codebook update with the method's noise injection."""
        if method == "SR_C":
            RXn = sr_c_perturb(kc, RX, it, niter, schedule, p)
            return update_C(RXn, B)
        C = update_C(RX, B)
        return sr_d_perturb(kc, C, it, niter, schedule, p)

    # Init (reference `src/SR.jl:60-75`)
    C0 = sr_step(jax.random.fold_in(key, 0), B0,
                 jnp.asarray(0 if method == "SR_C" else 1))
    B1 = encoding_icm(jax.random.fold_in(key, 1), RX, C0, B0,
                      ilsiter=ilsiter, icmiter=icmiter, npert=npert,
                      randord=randord, chunk=chunk)

    def body(it, state):
        C, B, obj = state
        obj = obj.at[it].set(qerror(RX, C, B))
        C = sr_step(jax.random.fold_in(key, 2 * it + 2), B, it + 1)
        B = encoding_icm(jax.random.fold_in(key, 2 * it + 3), RX, C, B,
                         ilsiter=ilsiter, icmiter=icmiter, npert=npert,
                         randord=randord, chunk=chunk)
        return C, B, obj

    obj0 = jnp.zeros((niter + 1,), jnp.float32)
    C, B, obj = lax.fori_loop(0, niter, body, (C0, B1, obj0))
    obj = obj.at[niter].set(qerror(RX, C, B))
    # Fold the rotation into the codebooks (reference `src/SR.jl:78-80`)
    C = jnp.einsum("de,mhe->mhd", R0, C,
                   preferred_element_type=jnp.float32)
    return LSQModel(codebooks=C), B, obj
