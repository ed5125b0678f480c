"""Asymmetric-distance (ADC) linear scan + recall evaluation.

Capability parity with reference `src/Linscan.jl` (``linscan_pq`` :5-26,
``linscan_opq`` :93-115, ``linscan_lsq`` :118-157, ``linscan_cq``
:160-193, ``eval_recall`` :196-234) and the native scan kernels it wraps
(`deps/src/linscan_aqd.cpp:37-102`,
`deps/src/linscan_aqd_pairwise_byte.cpp:14-176`).

TPU-first design — **no table lookups**. The reference builds per-query
LUTs and gather-accumulates one byte at a time (OpenMP over queries). On
TPU, random gathers are slow and matmuls are ~free, and the LUT scan is
mathematically a distance between the query and the *reconstruction*:

    sum_i LUT_i[B_i]  ==  |q|^2 - 2 q.x_hat + |x_hat|^2      (PQ/OPQ)
    -2 sum_i q.C_i[B_i] + dbnorm                             (LSQ byte-norms)
    sum_i |q - C_i[B_i]|^2                                   (CQ)

so the scan becomes: stream code tiles, **decompress each tile once via
one-hot matmuls (MXU)**, hit it with a (nq, d) x (d, tile) gemm (MXU),
and keep per-tile top-k (exact: global top-k is contained in the union
of per-tile top-k). The decompress cost is amortized over all queries in
the batch. Identical scores to the reference's LUT accumulation up to
f32 summation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rayuela_tpu.ops.qerror import reconstruct, reconstruct_pq
from rayuela_tpu.utils import cdiv

Array = jax.Array


def _pad_axis0(x: Array, total: int, fill=0):
    pad = total - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


@partial(jax.jit, static_argnames=("k", "pq", "tile", "include_q2"))
def scan_topk(Q: Array, C: Array, B: Array, *, k: int,
              pq: bool = False, norm_term: Array | None = None,
              tile: int = 1 << 16, include_q2: bool = True
              ) -> tuple[Array, Array]:
    """Tiled decompress-and-gemm ADC scan with exact top-k.

    Args:
      Q: (nq, d) queries (already rotated for OPQ).
      C: (m, h, d) or (m, h, d//m) codebooks.
      B: (n, m) int32 codes.
      k: neighbors to return.
      pq: concatenative (True) vs additive (False) decode.
      norm_term: optional (n,) replacement for |x_hat|^2 (LSQ quantized
        dbnorms, reference `src/Linscan.jl:118-157`; or CQ's
        sum_i |c_i|^2). If None, the exact |x_hat|^2 is used.
      include_q2: add the per-query constant so returned values are true
        squared distances (ranking-irrelevant).

    Returns: (dists (nq, k) f32 ascending, ids (nq, k) int32).
    """
    nq = Q.shape[0]
    n = B.shape[0]
    k = min(k, n)  # never return padded (inf, fake-id) entries
    tile = min(tile, max(128, 1 << (n - 1).bit_length()))
    ntiles = cdiv(n, tile)
    npad = ntiles * tile

    Bp = _pad_axis0(B, npad).reshape(ntiles, tile, -1)
    nt = _pad_axis0(norm_term, npad).reshape(ntiles, tile) \
        if norm_term is not None else None
    starts = (jnp.arange(ntiles, dtype=jnp.int32) * tile)

    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True) if include_q2 else 0.0
    kk = min(k, tile)

    def tile_fn(args):
        Bt, start, ntt = args
        Xh = reconstruct_pq(C, Bt, Q.shape[1]) if pq \
            else reconstruct(C, Bt)                               # (tile,d)
        qx = jnp.matmul(Q, Xh.T, preferred_element_type=jnp.float32)
        x2 = jnp.sum(Xh * Xh, axis=-1) if ntt is None else ntt
        scores = q2 - 2.0 * qx + x2[None, :]                      # (nq,tile)
        gidx = start + lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        scores = jnp.where(gidx < n, scores, jnp.inf)
        neg, loc = lax.top_k(-scores, kk)
        return -neg, start + loc

    vals, ids = lax.map(tile_fn, (Bp, starts, nt))
    # (ntiles, nq, kk) → merge
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(nq, ntiles * kk)
    ids = jnp.transpose(ids, (1, 0, 2)).reshape(nq, ntiles * kk)
    neg, loc = lax.top_k(-vals, min(k, ntiles * kk))
    return -neg, jnp.take_along_axis(ids, loc, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "tile"))
def exact_rescan(Q: Array, Xd: Array, x2: Array, k: int,
                 tile: int = 1 << 15) -> tuple[Array, Array]:
    """Exact XLA top-k over an already-decoded base — the fallback for
    queries the Pallas scan's verification flags."""
    n = Xd.shape[0]
    k = min(k, n)
    ntiles = cdiv(n, tile)
    npad = ntiles * tile
    Xp = _pad_axis0(Xd, npad).reshape(ntiles, tile, -1)
    x2p = _pad_axis0(x2, npad, fill=jnp.inf).reshape(ntiles, tile)
    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)
    starts = jnp.arange(ntiles, dtype=jnp.int32) * tile
    kk = min(k, tile)

    def tile_fn(args):
        Xt, x2t, start = args
        s = q2 - 2.0 * jnp.matmul(Q, Xt.T,
                                  preferred_element_type=jnp.float32) \
            + x2t[None, :]
        neg, loc = lax.top_k(-s, kk)
        return -neg, start + loc

    vals, ids = lax.map(tile_fn, (Xp, x2p, starts))
    nq = Q.shape[0]
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(nq, ntiles * kk)
    ids = jnp.transpose(ids, (1, 0, 2)).reshape(nq, ntiles * kk)
    neg, loc = lax.top_k(-vals, min(k, ntiles * kk))
    return -neg, jnp.take_along_axis(ids, loc, axis=1).astype(jnp.int32)


def _route(Q: Array, C: Array, B: Array, *, k: int, pq: bool,
           norm_term: Array | None = None, backend: str = "auto",
           **kw) -> tuple[Array, Array]:
    """Pick the scan backend: the fused Pallas kernel on TPU (decode
    once + on-chip top-k + verified-exact fallback), the pure-XLA tiled
    scan elsewhere."""
    if backend == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        big = Q.shape[0] >= 32 and B.shape[0] >= 1 << 14
        backend = "pallas" if (on_tpu and big and k <= 96 * 128) else "xla"
    if backend == "pallas":
        from rayuela_tpu.search.scan_pallas import build_index, search
        idx = build_index(C, B, pq=pq, d=Q.shape[1], norm_term=norm_term)
        return search(idx, Q, min(k, B.shape[0]))
    return scan_topk(Q, C, B, k=k, pq=pq, norm_term=norm_term, **kw)


# ---------------------------------------------------------------------------
# Reference-parity front-ends (names mirror src/Linscan.jl)
# ---------------------------------------------------------------------------

def linscan_pq(C: Array, Q: Array, B: Array, k: int = 1000,
               **kw) -> tuple[Array, Array]:
    """PQ ADC scan. Reference `src/Linscan.jl:5-26` →
    `deps/src/linscan_aqd.cpp`."""
    return _route(Q, C, B, k=k, pq=True, **kw)


def linscan_opq(C: Array, Q: Array, B: Array, R: Array, k: int = 1000,
                **kw) -> tuple[Array, Array]:
    """OPQ scan: rotate queries, then PQ scan. Reference
    `src/Linscan.jl:93-115`."""
    Qr = jnp.matmul(Q, R, preferred_element_type=jnp.float32)
    return _route(Qr, C, B, k=k, pq=True, **kw)


def linscan_lsq(C: Array, Q: Array, B: Array, norms_cbook: Array,
                norms_codes: Array, R: Array | None = None,
                k: int = 1000, **kw) -> tuple[Array, Array]:
    """Full-dim additive scan with a quantized-norms byte.

    Reference `src/Linscan.jl:118-157` →
    `deps/src/linscan_aqd_pairwise_byte.cpp:14-94`: dot-product LUTs
    plus a separate dbnorms table indexed by the extra code byte.
    """
    Qr = Q if R is None else jnp.matmul(Q, R,
                                        preferred_element_type=jnp.float32)
    dbnorms = jnp.take(norms_cbook.reshape(-1), norms_codes.reshape(-1))
    return _route(Qr, C, B, k=k, pq=False, norm_term=dbnorms, **kw)


def linscan_cq(C: Array, Q: Array, B: Array, k: int = 1000,
               **kw) -> tuple[Array, Array]:
    """CQ-style scan: sum over codebooks of |q - c_i|^2 (no norms byte).

    Reference `src/Linscan.jl:160-193` →
    `linscan_aqd_pairwise_byte.cpp:97-176`. Differs from true distance by
    per-codebook norms: norm_term = sum_i |C_i[B_i]|^2 and the q2
    constant appears m times."""
    m = C.shape[0]
    c2 = jnp.sum(C * C, axis=-1)                       # (m, h)
    codenorms = jnp.sum(
        jnp.take_along_axis(c2, B.T, axis=1), axis=0)  # (n,)
    d, i = _route(Q, C, B, k=k, pq=False, norm_term=codenorms, **kw)
    # _route's scores include one |q|^2; CQ's convention has m of them
    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)
    return d + (m - 1) * q2, i


# ---------------------------------------------------------------------------
# Recall evaluation
# ---------------------------------------------------------------------------

def eval_recall(ids: Array, gt: Array, *, ks=(1, 2, 5, 10, 20, 50, 100,
                                              200, 500, 1000, 2000,
                                              5000, 10000),
                verbose: bool = True) -> np.ndarray:
    """Recall@N curve: fraction of queries whose true NN appears in the
    top-N returned ids, for N = 1..k.

    Reference `src/Linscan.jl:196-234` (prints r@{1,2,5,...}, returns the
    full curve)."""
    ids = jnp.asarray(ids)
    gt = jnp.asarray(gt).reshape(-1)
    hits = (ids == gt[:, None]).astype(jnp.float32)
    curve = np.asarray(jnp.mean(lax.cummax(hits, axis=1), axis=0))
    if verbose:
        for N in ks:
            if N <= curve.shape[0]:
                print(f"recall@{N} = {curve[N - 1]:.4f}")
    return curve
