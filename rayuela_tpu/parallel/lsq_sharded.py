"""Sharded LSQ/LSQ++ training step — the flagship multi-chip path.

Maps the reference's single-GPU training loop (`src/SR.jl:88-175`,
`src/LSQ_GPU.jl`) onto a device mesh:

* **codebook update**: each ``data`` shard accumulates its local
  normal-equation statistics (G, F) — exact sums over its slice of n —
  then one `psum` over ICI makes them global and every device solves the
  same (mh, mh) system replicated (SURVEY.md §2.5: "replicated
  normal-equation solve after psum of statistics").
* **encoding**: ILS/ICM is embarrassingly parallel over vectors; each
  shard encodes its local slice with the shared codebooks — the TPU
  equivalent of the reference farming `SharedArray` chunks to Julia
  workers (`src/LSQ.jl:202-206`).

Everything runs under one `shard_map` + jit, so the step scales from 1
chip to a pod slice without code changes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rayuela_tpu.models.sr import sr_d_perturb
from rayuela_tpu.ops.codebook_update import codebook_stats, _solve_direct
from rayuela_tpu.ops.icm import encoding_icm
from rayuela_tpu.ops.qerror import qerror

Array = jax.Array


def make_sr_train_step(mesh: Mesh, *, h: int, niter: int,
                       ilsiter: int = 8, icmiter: int = 4,
                       npert: int = 4, randord: bool = True,
                       method: str = "SR_D", schedule: int = 1,
                       p: float = 0.5, chunk: int = 8192,
                       stats_chunk: int = 16384):
    """Build a jitted one-iteration SR/LSQ step over ``mesh``.

    Returned step: ``(X, B, C, it, key) -> (C', B', obj)`` with X and B
    sharded on the ``data`` axis, C replicated. ``method='LSQ'`` skips
    the SR noise (plain LSQ step)."""
    from jax import shard_map

    def local_step(X, B, C, it, key):
        # --- codebook update: local stats + psum over ICI ---
        G, F = codebook_stats(X, B, h, chunk=stats_chunk)
        G = jax.lax.psum(G, "data")
        F = jax.lax.psum(F, "data")
        C = _solve_direct(G, F, h, 1e-4)
        if method == "SR_D":
            C = sr_d_perturb(jax.random.fold_in(key, 0), C, it, niter,
                             schedule, p)
        # (SR_C noise is added to X before stats by the caller.)

        # --- encoding: data-parallel ICM on the local shard ---
        shard = jax.lax.axis_index("data")
        B = encoding_icm(jax.random.fold_in(key, 1 + shard), X, C, B,
                         ilsiter=ilsiter, icmiter=icmiter, npert=npert,
                         randord=randord, chunk=chunk)
        err = jax.lax.psum(jnp.sum(
            jnp.square(X - _decode(C, B))), "data")
        return C, B, err

    def _decode(C, B):
        from rayuela_tpu.ops.qerror import reconstruct
        return reconstruct(C, B)

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P(), P(), P()),
        out_specs=(P(), P("data", None), P()),
        check_vma=False)

    @jax.jit
    def step(X, B, C, it, key):
        C, B, sq = fn(X, B, C, it, key)
        return C, B, sq / X.shape[0]

    return step


@partial(jax.jit, static_argnames=("h", "chunk"))
def replicated_solve_matches(X: Array, B: Array, h: int,
                             chunk: int = 16384) -> Array:
    """Single-device reference solve, for mesh-equivalence tests."""
    G, F = codebook_stats(X, B, h, chunk=chunk)
    return _solve_direct(G, F, h, 1e-4)
