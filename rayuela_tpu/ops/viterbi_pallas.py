"""Pallas Viterbi (min-sum) kernel for chain-structured MCQ encoding.

TPU-native replacement for the reference's dedicated Viterbi backends
(C++ OpenMP `deps/src/encode_icm.cpp:63-152`, CUDA ``viterbi_forward``
`deps/src/cudautils.cu:198-291`) and for the XLA path in
`rayuela_tpu.ops.viterbi`, whose broadcast min-plus materializes a
(chunk, h, h) transient (512 MB at chunk=2048, h=256) plus (m-1, n, h)
argmin tables in HBM.

Design — everything for one block of ``bc`` vectors lives in VMEM:

* **Unaries in-kernel**: ``u_i = |c|^2 - 2 C_i x`` is one (h, d) x
  (d, bc) MXU matmul per stage; only the raw ``X^T`` block streams from
  HBM (the XLA path would round-trip an 8 GB (m, n, h) unary tensor at
  SIFT1M scale).
* **No argmin tables.** The forward pass stores only the per-stage
  min-cost vectors ``f_i`` — (m, h, bc) f32 = 2 MB — and the backtrace
  *recomputes* each argmin: knowing ``b_{i+1}``, ``b_i = argmin_a
  f_i(a) + bin_i(a, b_{i+1})`` needs one (h, bc) column gather (an
  exact one-hot matmul) + a sublane argmin per stage. Any argmin
  attaining the min yields a globally optimal path, so recomputation is
  exact. This halves forward-pass VPU work (no index carry) and
  removes the table traffic entirely.
* The min-plus inner loop reduces over ``a`` in sublane blocks of 8:
  ``(8, h, bc)`` broadcast add + min — layouts keep h on sublanes and
  vectors on lanes so every step is straight VPU work.

All matmuls run at ``Precision.HIGHEST`` (one-hot gathers and unary
terms must be exact f32 for equivalence with the XLA path; their cost
is ~1% of the inherent n·m·h^2 min-plus VPU work).
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
ABLK = 8   # sublane block for the min-plus reduction over `a`


def _viterbi_kernel(xt_ref, cflat_ref, c2_ref, bin_ref, out_ref,
                    fstack, *, m: int, h: int, bc: int):
    hi = lax.Precision.HIGHEST

    # ---- unaries + forward pass ----------------------------------
    def unary(i):
        return c2_ref[i * h:(i + 1) * h, :] - 2.0 * lax.dot_general(
            cflat_ref[i * h:(i + 1) * h, :], xt_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)

    fstack[0] = unary(0)                                  # (h, bc)
    for i in range(m - 1):
        def ablock(a0, acc, i=i):
            # cand[a, b, v] = f_i[a0+a, v] + bin_i[a0+a, b]; slices go
            # through the REFS (Mosaic has no dynamic_slice on values)
            fa = fstack[i, pl.ds(a0 * ABLK, ABLK), :]     # (ABLK, bc)
            ba = bin_ref[i, pl.ds(a0 * ABLK, ABLK), :]    # (ABLK, h)
            cand = fa[:, None, :] + ba[:, :, None]        # (ABLK, h, bc)
            return jnp.minimum(acc, jnp.min(cand, axis=0))

        mincost = lax.fori_loop(
            0, h // ABLK, ablock,
            jnp.full((h, bc), jnp.inf, jnp.float32))
        fstack[i + 1] = unary(i + 1) + mincost

    # ---- backtrace (argmin recomputation) ------------------------
    iota_h = lax.broadcasted_iota(jnp.int32, (h, bc), 0)

    def argmin0(t):
        mn = jnp.min(t, axis=0, keepdims=True)
        return jnp.min(jnp.where(t == mn, iota_h, h), axis=0)

    b = argmin0(fstack[m - 1])                            # (bc,) i32
    out_ref[m - 1, :] = b
    for i in range(m - 2, -1, -1):
        onehot = (iota_h == b[None, :]).astype(jnp.float32)
        gathered = lax.dot_general(                       # bin_i[:, b]
            bin_ref[i], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        b = argmin0(fstack[i] + gathered)
        out_ref[i, :] = b


@functools.partial(jax.jit, static_argnames=("bc", "interpret"))
def viterbi_encode_pallas(X: Array, C: Array, *, bc: int = 256,
                          interpret: bool = False) -> Array:
    """Exact chain-optimal codes ``(n, m) int32`` via the fused kernel.

    Same contract as `rayuela_tpu.ops.viterbi.viterbi_encode`
    (reference ``quantize_chainq``, `src/ChainQ.jl:305-348`)."""
    n, d = X.shape
    m, h, _ = C.shape
    if h % ABLK or h < ABLK:
        raise ValueError(f"h={h} must be a multiple of {ABLK}")
    nblk = cdiv(n, bc)
    npad = nblk * bc

    XT = jnp.pad(X, ((0, npad - n), (0, 0))).T            # (d, npad)
    Cflat = C.reshape(m * h, d)
    c2 = jnp.sum(Cflat * Cflat, axis=-1).reshape(m * h, 1)
    from rayuela_tpu.ops.viterbi import chain_binaries
    binaries = chain_binaries(C) if m > 1 \
        else jnp.zeros((1, h, h), jnp.float32)

    kern = functools.partial(_viterbi_kernel, m=m, h=h, bc=bc)
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((d, bc), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(1, m - 1), h, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bc), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((m, h, bc), jnp.float32)],
        interpret=interpret,
    )(XT, Cflat, c2, binaries)
    return out.T[:n]
