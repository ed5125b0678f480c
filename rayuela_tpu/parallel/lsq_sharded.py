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


# ---------------------------------------------------------------------------
# Full training loop (the facade's mesh= path)
# ---------------------------------------------------------------------------

import functools as _functools

import numpy as np
from jax.sharding import NamedSharding


@_functools.lru_cache(maxsize=16)
def _sharded_icm_fn(mesh: Mesh, ilsiter: int, icmiter: int, npert: int,
                    randord: bool, chunk: int):
    from jax import shard_map

    def local(key, X, C, B):
        shard = jax.lax.axis_index("data")
        return encoding_icm(jax.random.fold_in(key, shard), X, C, B,
                            ilsiter=ilsiter, icmiter=icmiter,
                            npert=npert, randord=randord, chunk=chunk)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P("data", None), P(),
                             P("data", None)),
                   out_specs=P("data", None), check_vma=False)
    return jax.jit(fn)


def sharded_encoding_icm(mesh: Mesh, key, X, C, B0, *, ilsiter: int = 8,
                         icmiter: int = 4, npert: int = 4,
                         randord: bool = True,
                         chunk: int = 8192) -> Array:
    """Data-parallel ILS/ICM encode over the ``data`` mesh axis — the
    base-set encoding path when a mesh is given (reference
    `src/LSQ.jl:202-206`: SharedArray chunks farmed to workers). Each
    shard perturbs with a shard-keyed PRNG stream. Ragged n pads and
    trims (pad rows cost compute, nothing else)."""
    ndata = mesh.shape["data"]
    n = X.shape[0]
    pad = -n % ndata
    X = jnp.asarray(X, jnp.float32)
    B0 = jnp.asarray(B0, jnp.int32)
    if pad:
        X = jnp.pad(X, ((0, pad), (0, 0)))
        B0 = jnp.pad(B0, ((0, pad), (0, 0)))
    fn = _sharded_icm_fn(mesh, ilsiter, icmiter, npert, randord, chunk)
    return fn(key, X, jnp.asarray(C), B0)[:n]


@_functools.lru_cache(maxsize=16)
def _family_step_fns(mesh: Mesh, h: int, niter: int, ilsiter: int,
                     icmiter: int, npert: int, randord: bool,
                     method: str, schedule: int, p: float, chunk: int):
    """Jitted init / iteration / objective steps for the sharded
    LSQ/SR-C/SR-D trainer (`train_lsq_family_sharded`). Mirrors
    `models.sr.train_sr` / `models.lsq.train_lsq` in the rotated frame
    (LSQ in the rotated frame with a final fold-back is the same
    optimization — R is orthonormal). Pad rows carry code -1 (zero
    one-hot → exact stats) and are masked out of objectives and the
    SR-C global std."""
    from jax import lax, shard_map

    from rayuela_tpu.models.sr import apply_schedule, sr_d_perturb
    from rayuela_tpu.ops.qerror import reconstruct

    def _solve(RX, B):
        G, F = codebook_stats(RX, B, h, chunk=16384)
        G = lax.psum(G, "data")
        F = lax.psum(F, "data")
        return _solve_direct(G, F, h, 1e-4)

    def _sr_step(kc, RX, B, it, mask, nvalid):
        if method == "SR_C":
            # global per-dim std over the VALID rows: psum'd moments
            Xm = jnp.where(mask[:, None], RX, 0.0)
            s1 = lax.psum(jnp.sum(Xm, axis=0), "data") / nvalid
            s2 = lax.psum(jnp.sum(Xm * Xm, axis=0), "data") / nvalid
            stdx = jnp.sqrt(jnp.maximum(s2 - s1 * s1, 0.0))
            stdx = apply_schedule(stdx, it, niter, schedule, p)
            shard = lax.axis_index("data")
            noise = jax.random.normal(
                jax.random.fold_in(kc, shard), RX.shape, RX.dtype)
            return _solve(RX + noise * stdx, B)
        C = _solve(RX, B)
        if method == "SR_D":
            C = sr_d_perturb(kc, C, it, niter, schedule, p)
        return C

    def _encode(ke, RX, C, B, mask):
        shard = lax.axis_index("data")
        B = encoding_icm(jax.random.fold_in(ke, shard), RX, C, B,
                         ilsiter=ilsiter, icmiter=icmiter, npert=npert,
                         randord=randord, chunk=chunk)
        return jnp.where(mask[:, None], B, -1)

    def _masked_obj(RX, C, B, mask, nvalid):
        res = RX - reconstruct(C, B)
        res = jnp.where(mask[:, None], res, 0.0)
        return lax.psum(jnp.sum(res * res), "data") / nvalid

    def init_local(RX, B0, key, mask, nvalid):
        # `src/SR.jl:60-75` / `src/LSQ.jl:346-356` init
        it0 = jnp.asarray(0 if method == "SR_C" else 1, jnp.float32)
        C0 = _sr_step(jax.random.fold_in(key, 0), RX, B0, it0, mask,
                      nvalid)
        B1 = _encode(jax.random.fold_in(key, 1), RX, C0, B0, mask)
        return C0, B1

    def iter_local(RX, C, B, it, key, mask, nvalid):
        obj = _masked_obj(RX, C, B, mask, nvalid)
        C = _sr_step(jax.random.fold_in(key, 2 * it + 2), RX, B,
                     jnp.asarray(it + 1, jnp.float32), mask, nvalid)
        B = _encode(jax.random.fold_in(key, 2 * it + 3), RX, C, B, mask)
        return obj, C, B

    def obj_local(RX, C, B, mask, nvalid):
        return _masked_obj(RX, C, B, mask, nvalid)

    dn = P("data", None)
    init = shard_map(init_local, mesh=mesh,
                     in_specs=(dn, dn, P(), P("data"), P()),
                     out_specs=(P(), dn), check_vma=False)
    step = shard_map(iter_local, mesh=mesh,
                     in_specs=(dn, P(), dn, P(), P(), P("data"), P()),
                     out_specs=(P(), P(), dn), check_vma=False)
    obj = shard_map(obj_local, mesh=mesh,
                    in_specs=(dn, P(), dn, P("data"), P()),
                    out_specs=P(), check_vma=False)
    return jax.jit(init), jax.jit(step), jax.jit(obj)


def train_lsq_family_sharded(mesh: Mesh, key, X, B0, R0, *,
                             h: int = 256, niter: int = 25,
                             ilsiter: int = 8, icmiter: int = 4,
                             npert: int = 4, randord: bool = True,
                             method: str = "LSQ", schedule: int = 1,
                             p: float = 0.5, chunk: int = 8192):
    """LSQ / SR-C / SR-D training over a device mesh — the mesh= path
    of `api.train`. Same contract as `models.lsq.train_lsq` /
    `models.sr.train_sr`: ``(LSQModel, codes (n, m), obj (niter+1,))``
    with the rotation folded into the returned codebooks.

    Differences from the single-device trainers: ICM perturbation keys
    fold in the shard index (each shard explores independently), and
    LSQ runs in the rotated frame throughout with one final fold-back
    (identical optimization — R is orthonormal). The reference's
    equivalent distribution is `src/LSQ.jl:202-206` (SharedArray
    chunks farmed to Julia workers)."""
    from rayuela_tpu.models.lsq import LSQModel

    if method not in ("LSQ", "SR_C", "SR_D"):
        raise ValueError(f"unknown method {method!r}")
    X = jnp.asarray(X, jnp.float32)
    B0 = jnp.asarray(B0, jnp.int32)
    R0 = jnp.asarray(R0, jnp.float32)
    n = X.shape[0]
    ndata = mesh.shape["data"]
    pad = -n % ndata
    mask = np.ones((n + pad,), bool)
    if pad:
        X = jnp.pad(X, ((0, pad), (0, 0)))
        B0 = jnp.pad(B0, ((0, pad), (0, 0)), constant_values=-1)
        mask[n:] = False
    shd = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    RX = jax.jit(
        lambda x, r: jnp.matmul(x, r,
                                preferred_element_type=jnp.float32),
        out_shardings=shd)(jax.device_put(X, shd),
                           jax.device_put(R0, rep))
    B = jax.device_put(B0, shd)
    maskj = jax.device_put(jnp.asarray(mask),
                           NamedSharding(mesh, P("data")))
    nvalid = jax.device_put(jnp.float32(n), rep)
    key = jax.device_put(key, rep)

    init, step, objf = _family_step_fns(
        mesh, h, niter, ilsiter, icmiter, npert, randord, method,
        schedule, p, chunk)
    C, B = init(RX, B, key, maskj, nvalid)
    objs = []
    for it in range(niter):
        o, C, B = step(RX, C, B, jnp.int32(it), key, maskj, nvalid)
        objs.append(o)
    objs.append(objf(RX, C, B, maskj, nvalid))
    # fold the rotation into the codebooks (`src/SR.jl:78-80`)
    C = jnp.einsum("de,mhe->mhd", R0, C,
                   preferred_element_type=jnp.float32)
    return LSQModel(codebooks=C), B[:n], jnp.stack(objs)
