"""Pallas ICM sweep kernel — the encode-path hot loop on-chip.

Replaces the XLA formulation of `rayuela_tpu.ops.icm._icm_sweeps` for
the TPU fast path. The XLA version round-trips a (nc, m*h) one-hot
through HBM on every node visit (measured ~8% MXU utilization); here
everything lives in VMEM across all ``icmiter * m`` node visits of a
chunk:

* the conditioning tables ``T (m, m*h, h)`` (bf16, diagonal blocks
  zero) are VMEM-resident — at m=8, h=256 they are 8 MB, which is why
  the kernel requires ``m*m*h*h*2 bytes`` to fit (m <= 11 at h=256);
  larger m falls back to the XLA path;
* unaries for the chunk are computed in-kernel with one
  (c, d) x (d, m*h) matmul and stay in VMEM;
* the one-hot code indicator is maintained *incrementally*: only the
  h-wide block of the node just updated is rewritten, so each visit is
  one (c, m*h) x (m*h, h) bf16 MXU matmul + a 256-lane argmin + two
  block writes.

Equivalent semantics to the reference's CUDA ``condition_icm3``
(`deps/src/cudautils.cu:334-437`): condition each node on all other
codebooks' current codes, argmin over h, write in place, in a shared
node order per sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayuela_tpu.utils import cdiv

Array = jax.Array


def _kernel(x_ref, b_ref, cflat_ref, c2_ref, t_ref,
            bout_ref, eng_ref, oh_scr, u_scr, *, m: int, h: int, c: int,
            icmiter: int):
    """Inputs arrive PERMUTED by the sweep's node order (host side), so
    every index below is static: nodes are visited 0..m-1 and all
    block selections are compile-time.

    Layouts are chosen so per-visit block selection rides the LEADING
    axis (free in Mosaic — minor (sublane, lane) tiles untouched):
    unaries and the one-hot indicator live as (m, c, h); the
    conditioning contraction is a dot_general contracting (m, h) of
    the indicator against t_ref[i] (m, h, h) — the m per-pair matmuls
    are independent and pipeline on the MXU."""
    # unaries: |c|^2 - 2 x.c → (c, m*h) → (m, c, h), VMEM-resident
    u = c2_ref[:] - 2.0 * lax.dot_general(
        x_ref[:], cflat_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (c, mh)
    u_scr[:] = jnp.transpose(u.reshape(c, m, h), (1, 0, 2))

    lanes = lax.broadcasted_iota(jnp.int32, (c, h), 1)
    for j in range(m):
        oh_scr[j] = (lanes == b_ref[j, :][:, None]).astype(oh_scr.dtype)

    bout_ref[:] = b_ref[:]

    def conditional(i):
        # m-1 independent (c, h) x (h, h) matmuls (Mosaic has no multi-
        # contracting-dim matmul); their independence lets the MXU
        # pipeline them back-to-back within the visit.
        parts = [lax.dot_general(
            oh_scr[j], t_ref[i, j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            for j in range(m) if j != i]
        return u_scr[i] + sum(parts)                      # (c, h)

    for t in range(icmiter * m):
        i = t % m
        newb = jnp.argmin(conditional(i), axis=-1).astype(jnp.int32)
        bout_ref[i, :] = newb
        oh_scr[i] = (lanes == newb[:, None]).astype(oh_scr.dtype)

    # Exact MRF energy of the final codes (up to the per-vector |x|^2
    # constant): E = 0.5 * sum_i [cond_i(B_i) + u_i(B_i)] — one more
    # conditioning pass; emitting it here saves the caller a full
    # decode-based cost evaluation per ILS round.
    acc = jnp.zeros((c,), jnp.float32)
    for i in range(m):
        pick = oh_scr[i].astype(jnp.float32)
        acc = acc + jnp.sum((conditional(i) + u_scr[i]) * pick, axis=-1)
    eng_ref[0, :] = 0.5 * acc


def _kernel_streamed(x_ref, b_ref, cflat_ref, c2_ref, t_hbm,
                     bout_ref, eng_ref, oh_scr, u_scr, tbuf, sem,
                     *, m: int, h: int, c: int, icmiter: int):
    """Streaming variant for m too large to hold all m^2 h^2 tables in
    VMEM (the 128-bit m=15/16 configs): the conditioning tables live in
    HBM and each node's (m*h, h) slice is DMA'd into a double buffer,
    prefetched one visit ahead — the copy (~2 MB at m=16) overlaps the
    visit's ~130 MFlop of matmuls."""
    u = c2_ref[:] - 2.0 * lax.dot_general(
        x_ref[:], cflat_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (c, mh)
    u_scr[:] = jnp.transpose(u.reshape(c, m, h), (1, 0, 2))

    lanes = lax.broadcasted_iota(jnp.int32, (c, h), 1)
    for j in range(m):
        oh_scr[j] = (lanes == b_ref[j, :][:, None]).astype(oh_scr.dtype)
    bout_ref[:] = b_ref[:]

    nvisit = icmiter * m
    total = nvisit + m              # sweeps + one energy pass

    def dma(slot, node):
        return pltpu.make_async_copy(t_hbm.at[node], tbuf.at[slot],
                                     sem.at[slot])

    def conditional(i, slot):
        parts = [lax.dot_general(
            oh_scr[j], tbuf[slot, j * h:(j + 1) * h, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            for j in range(m) if j != i]
        return u_scr[i] + sum(parts)                     # (c, h)

    dma(0, 0).start()
    acc = jnp.zeros((c,), jnp.float32)
    for t in range(total):
        i, slot = t % m, t % 2
        if t + 1 < total:
            dma((t + 1) % 2, (t + 1) % m).start()
        dma(slot, i).wait()
        cond = conditional(i, slot)
        if t < nvisit:              # ICM visit: argmin + write
            newb = jnp.argmin(cond, axis=-1).astype(jnp.int32)
            bout_ref[i, :] = newb
            oh_scr[i] = (lanes == newb[:, None]).astype(oh_scr.dtype)
        else:                       # energy pass over the final codes
            pick = oh_scr[i].astype(jnp.float32)
            acc = acc + jnp.sum((cond + u_scr[i]) * pick, axis=-1)
    eng_ref[0, :] = 0.5 * acc


@functools.partial(jax.jit,
                   static_argnames=("icmiter", "chunk", "interpret",
                                    "force_streamed"))
def icm_sweeps_pallas(X: Array, C: Array, B: Array, order: Array,
                      icmiter: int, chunk: int = 256,
                      interpret: bool = False,
                      force_streamed: bool = False
                      ) -> tuple[Array, Array]:
    """``icmiter`` ICM sweeps for all vectors. ``X (n, d)``,
    ``C (m, h, d)``, ``B (n, m)`` int32, ``order (m,)`` int32 node
    order. Returns ``(codes (n, m), energy (n,))`` where energy is the
    bf16-model MRF energy (no |x|^2 term). ``icmiter=0`` just evaluates
    the energy of the incoming codes."""
    from rayuela_tpu.ops.qerror import get_binaries

    n, d = X.shape
    m, h, _ = C.shape
    mh = m * h
    nchunks = cdiv(n, chunk)
    npad = nchunks * chunk

    # Permute codebooks (and codes) by the sweep order so the kernel
    # visits nodes 0..m-1 with fully static indexing.
    Cp = jnp.take(C, order, axis=0)
    inv = jnp.argsort(order)

    Bin = get_binaries(Cp)
    Bin = Bin * (1.0 - jnp.eye(m))[:, :, None, None]
    # T[i, j, a, b] = bin[j, i][a, b] — per-target stacks of per-source
    # (h, h) tables, diagonal blocks zero
    T = jnp.transpose(Bin, (1, 0, 2, 3)).astype(jnp.bfloat16)
    Cflat = Cp.reshape(mh, d).astype(jnp.bfloat16)
    c2 = jnp.sum(Cp * Cp, axis=-1).reshape(1, mh)

    Xp = jnp.pad(X, ((0, npad - n), (0, 0))).astype(jnp.bfloat16)
    Bp = jnp.pad(jnp.take(B, order, axis=1),
                 ((0, npad - n), (0, 0))).T                  # (m, npad)

    # resident vs streamed is purely a VMEM-size decision here (lane
    # tiling legality is the callers' pallas_icm_* gates)
    resident = (m * mh * h * 2 <= (8 << 20)) and not force_streamed
    common_in = [
        pl.BlockSpec((chunk, d), lambda q: (q, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, chunk), lambda q: (0, q),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mh, d), lambda q: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mh), lambda q: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    common_out = (
        pl.BlockSpec((m, chunk), lambda q: (0, q),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk), lambda q: (0, q),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((m, npad), jnp.int32),
        jax.ShapeDtypeStruct((1, npad), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((m, chunk, h), jnp.bfloat16),  # one-hot indicator
        pltpu.VMEM((m, chunk, h), jnp.float32),   # unaries
    ]
    if resident:
        kern = functools.partial(_kernel, m=m, h=h, c=chunk,
                                 icmiter=icmiter)
        t_spec = pl.BlockSpec((m, m, h, h), lambda q: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        # tables stay in HBM, streamed per node visit (m=15/16 configs)
        kern = functools.partial(_kernel_streamed, m=m, h=h, c=chunk,
                                 icmiter=icmiter)
        t_spec = pl.BlockSpec(memory_space=pl.ANY)
        T = T.reshape(m, mh, h)
        scratch += [pltpu.VMEM((2, mh, h), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2,))]
    Bout, eng = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=common_in + [t_spec],
        out_specs=common_out,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Xp, Bp, Cflat, c2, T)
    return jnp.take(Bout.T[:n], inv, axis=1), eng[0, :n]


def pallas_icm_available(m: int, h: int, d: int,
                         vmem_budget: int = 12 << 20) -> bool:
    """Whether the VMEM-resident-tables kernel applies: lane dims must
    tile (h multiple of 128), and T (bf16) + one-hot + unaries +
    codebooks must stay under ~12 MB (m <= ~11 at h=256)."""
    if h % 128 != 0:
        return False
    mh = m * h
    need = (m * mh * h * 2        # T bf16
            + 256 * mh * (2 + 4)  # oh + u scratch at chunk=256
            + mh * d * 2)         # Cflat
    return need <= vmem_budget


def pallas_icm_supported(m: int, h: int, d: int,
                         vmem_budget: int = 12 << 20) -> bool:
    """Whether EITHER kernel variant applies (resident tables, or the
    HBM-streamed double-buffered variant — covers m=15/16 at h=256)."""
    if h % 128 != 0:
        return False
    if pallas_icm_available(m, h, d, vmem_budget):
        return True
    mh = m * h
    need = (2 * mh * h * 2        # double-buffered T_i slices
            + 256 * mh * (2 + 4)  # oh + u scratch at chunk=256
            + mh * d * 2)         # Cflat
    return need <= vmem_budget
