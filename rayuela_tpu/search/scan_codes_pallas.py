"""Code-resident Pallas ADC scan — search uint8 codes, never a decoded base.

This is the memory model that makes MCQ useful in deployment: the index
on chip is the **packed codes** (m bytes/vector + optional norms byte),
exactly like the reference's LUT scan over code arrays
(`deps/src/linscan_aqd.cpp:37-102`,
`deps/src/linscan_aqd_pairwise_byte.cpp:14-94`). A SIFT1M-class base at
m=8 is ~9 MB resident instead of the 512 MB f32 decode the fast
`scan_pallas` path keeps; a 3e7-vector base (15 GB decoded — does not
fit HBM) stays a ~270 MB code array.

Same math as the reference, reshaped for the MXU:

* The reference gather-accumulates ``sum_j LUT_j[code_j]`` one byte at a
  time per (query, vector). Here each kernel visit computes the whole
  (tile, Bq) score block as ``m`` one-hot matmuls: per codebook j,
  ``onehot(code_j) (tile, h) @ T_j (h, Bq)`` — identical sums, matrix
  throughput. Codes are unpacked from int32 words with VPU shifts.
* LUTs fold exactly what the reference folds: PQ/OPQ fold per-subspace
  ``|c|^2 - 2 c.q_sub`` (true distances up to +|q|^2); additive models
  fold ``-2 c.q`` plus a quantized-norms table indexed by the extra
  norms byte (reference `src/Linscan.jl:118-157` semantics).
* Selection reuses the per-lane bitonic running top-R + verification
  count of `scan_pallas` (scratch persists across the sequential tile
  grid), so the result is **exact for the LUT scores, always**: flagged
  queries re-run through an XLA gather scan over the same LUTs.

Tables default to bfloat16 on TPU (halves the dominant matmul cost and
the table DMA); the f32 accumulation and the verify kernel both consume
the same rounded tables, so exactness is preserved *for the bf16-table
scores* — use ``lut_dtype=jnp.float32`` to match the XLA scan bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayuela_tpu.search.scan_pallas import (LANES, _apply_network,
                                            _apply_network1,
                                            _count_below, _merge_stages,
                                            _pack_idbits,
                                            _packed_candidates,
                                            _prered_topk, _row_key,
                                            _select_insert_packed,
                                            _select_insert_packed_staged,
                                            _sort_stages,
                                            _tail_candidates_pallas,
                                            candidate_ids)
from rayuela_tpu.utils import cdiv, splitarray

Array = jax.Array


# ---------------------------------------------------------------------------
# Host-side index build: packed codes + per-query LUTs
# ---------------------------------------------------------------------------

def pack_codes(B: Array, norms_codes: Array | None = None) -> Array:
    """Pack per-vector codes into int32 words, 4 codes per word
    (little-endian bytes) → ``(n, ceil(m'/4)) int32`` where m' counts
    the optional norms byte. Requires all codes < 256 (h <= 256, the
    reference's uint8 storage, `deps/src/types.h`)."""
    B = jnp.asarray(B)
    if norms_codes is not None:
        B = jnp.concatenate(
            [B, jnp.asarray(norms_codes).reshape(-1, 1).astype(B.dtype)],
            axis=1)
    n, mprime = B.shape
    nw = cdiv(mprime, 4)
    Bp = jnp.pad(B.astype(jnp.uint32), ((0, 0), (0, nw * 4 - mprime)))
    w = Bp.reshape(n, nw, 4)
    packed = (w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
              | (w[..., 3] << 24))
    return lax.bitcast_convert_type(packed, jnp.int32)


def unpack_codes(packed: Array, mprime: int) -> Array:
    """Inverse of `pack_codes` → ``(n, m') int32``."""
    u = lax.bitcast_convert_type(packed, jnp.uint32)
    cols = [(u[:, j // 4] >> (8 * (j % 4))) & 0xFF
            for j in range(mprime)]
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def build_luts(C: Array, Q: Array, *, pq: bool = False,
               d: int | None = None,
               norms_cbook: Array | None = None) -> Array:
    """Per-query LUT stack ``T (m', h, nq) f32``.

    PQ/OPQ (``pq=True``): ``T[j,c,q] = |C_j[c]|^2 - 2 C_j[c].Q[q,sub_j]``
    (reference `src/Linscan.jl:5-26` table build). Additive
    (``pq=False``): ``T[j,c,q] = -2 C_j[c].Q[q]``; pass ``norms_cbook``
    (h',) to append the quantized-norms table the extra byte indexes
    (`src/Linscan.jl:118-157`). Either way scores exclude the +|q|^2
    constant (the front-end adds it)."""
    m, h, ds = C.shape
    nq = Q.shape[0]
    if pq:
        d = Q.shape[1] if d is None else d
        tabs = []
        for j, (st, sz) in enumerate(splitarray(d, m)):
            Qs = Q[:, st:st + sz]
            if sz < ds:
                Qs = jnp.pad(Qs, ((0, 0), (0, ds - sz)))
            c2 = jnp.sum(C[j] * C[j], axis=-1, keepdims=True)   # (h, 1)
            tabs.append(c2 - 2.0 * jnp.matmul(
                C[j], Qs.T, preferred_element_type=jnp.float32))
        T = jnp.stack(tabs)                                     # (m, h, nq)
    else:
        T = -2.0 * jnp.einsum("mhd,qd->mhq", C, Q,
                              preferred_element_type=jnp.float32)
    if norms_cbook is not None:
        if norms_cbook.size > h:
            raise ValueError(
                f"norms codebook ({norms_cbook.size} entries) must fit "
                f"the (h={h})-row table stack; train it with h' <= h "
                "(rayuela_tpu.search.norms.get_norms_codebook(h=...))")
        nt = jnp.broadcast_to(
            jnp.pad(norms_cbook.reshape(-1),
                    (0, h - norms_cbook.size))[:, None], (h, nq))
        T = jnp.concatenate([T, nt[None]], axis=0)
    return T


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _lut_scores(t_ref, codes_ref, *, mprime: int, h: int,
                lut_dtype) -> Array:
    """(tile, Bq) score block: per-codebook transposed one-hot
    (h, tile) x T_j (h, Bq) matmuls contracting the leading dim, codes
    unpacked from int32 words by VPU shifts.

    Codes arrive TRANSPOSED (nw, tile) so the block is ~nw*tile*4 bytes
    of VMEM instead of a lane-padded (tile, 128) slab, and the one-hot
    is built (h, tile) directly from the (1, tile) word row — no
    in-kernel transpose anywhere."""
    tile = codes_ref.shape[1]
    bq = t_ref.shape[1]
    iota_h = lax.broadcasted_iota(jnp.int32, (h, tile), 0)
    acc = jnp.zeros((tile, bq), jnp.float32)
    # bf16 operands: the one-hot is exact in bf16 and each product IS
    # the (bf16) table value, f32-accumulated — exact for bf16 tables.
    # f32 operands: the TPU MXU's default precision decomposes f32 into
    # ONE bf16 pass (~1e-3 relative error); force HIGHEST so the f32
    # path is an exact gather (it is the test/debug mode).
    prec = (lax.Precision.HIGHEST if t_ref.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    for j in range(mprime):
        w, sh = divmod(j, 4)
        word = codes_ref[w:w + 1, :]                      # (1, tile) i32
        c = lax.shift_right_logical(word, 8 * sh) & 0xFF
        ohT = (iota_h == c).astype(lut_dtype)             # (h, tile)
        acc = acc + lax.dot_general(
            ohT, t_ref[j * h:(j + 1) * h, :].astype(lut_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    return acc


def _masked_lut_scores(t_ref, codes_ref, t, *, rows, bq, mprime, h, n,
                       lut_dtype):
    s = _lut_scores(t_ref, codes_ref, mprime=mprime, h=h,
                    lut_dtype=lut_dtype)
    tile = rows * LANES
    gid2 = (t * tile
            + lax.broadcasted_iota(jnp.int32, (tile, bq), 0))
    return jnp.where(gid2 < n, s, jnp.inf)                # mask pad rows


def _codes_scan_kernel(t_ref, codes_ref, outv_ref, outi_ref,
                       bufv, bufi, sem, *, rows: int, r: int,
                       ntiles: int, bq: int, mprime: int, h: int,
                       n: int, lut_dtype):
    """f32+i32 mode, body kept in the round-1 inline form (see
    `scan_pallas._scan_kernel` for why)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        bufv[:] = jnp.full(bufv.shape, jnp.inf, jnp.float32)
        bufi[:] = jnp.zeros(bufi.shape, jnp.int32)

    s = _masked_lut_scores(t_ref, codes_ref, t, rows=rows, bq=bq,
                           mprime=mprime, h=h, n=n, lut_dtype=lut_dtype)
    tile = rows * LANES
    sv = s.reshape(rows, LANES, bq)
    gid = (t * tile
           + lax.broadcasted_iota(jnp.int32, (rows, LANES, bq), 0) * LANES
           + lax.broadcasted_iota(jnp.int32, (rows, LANES, bq), 1))
    sv, si = _apply_network(sv, gid, _sort_stages(rows), descending=True)
    mv = jnp.concatenate([bufv[:], sv], axis=0)
    mi = jnp.concatenate([bufi[:], si], axis=0)
    mv, mi = _apply_network(mv, mi, _merge_stages(r + rows))
    bufv[:] = mv[:r]
    bufi[:] = mi[:r]

    qb = pl.program_id(0)

    @pl.when(t == ntiles - 1)
    def _():
        cpv = pltpu.make_async_copy(
            bufv, outv_ref.at[:, :, pl.ds(qb * bq, bq)], sem.at[0])
        cpi = pltpu.make_async_copy(
            bufi, outi_ref.at[:, :, pl.ds(qb * bq, bq)], sem.at[1])
        cpv.start()
        cpi.start()
        cpv.wait()
        cpi.wait()


def _codes_scan_kernel_packed(t_ref, codes_ref, outp_ref, bufp, dminp,
                              sem, *, rows: int, r: int, ntiles: int,
                              bq: int, mprime: int, h: int, n: int,
                              lut_dtype, idbits: int, keep: int = 0):
    t = pl.program_id(1)
    s = _masked_lut_scores(t_ref, codes_ref, t, rows=rows, bq=bq,
                           mprime=mprime, h=h, n=n, lut_dtype=lut_dtype)
    _select_insert_packed(s, t, bufp, dminp, sem, outp_ref, rows=rows,
                          r=r, ntiles=ntiles, bq=bq, idbits=idbits,
                          keep=keep)


def _codes_verify_kernel(t_ref, codes_ref, tau_ref, cnt_ref, acc, accm,
                         *, rows: int, ntiles: int, mprime: int,
                         h: int, n: int, lut_dtype, idbits: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros(acc.shape, jnp.int32)
        accm[:] = jnp.zeros(accm.shape, jnp.int32)

    bq = tau_ref.shape[1]
    s = _masked_lut_scores(t_ref, codes_ref, t, rows=rows, bq=bq,
                           mprime=mprime, h=h, n=n, lut_dtype=lut_dtype)
    c = _count_below(s, t, tau_ref, rows=rows, bq=bq, idbits=idbits)
    acc[:] = acc[:] + c
    accm[:] = jnp.maximum(accm[:], c)

    @pl.when(t == ntiles - 1)
    def _():
        cnt_ref[0] = acc[:]
        cnt_ref[1] = accm[:]


# ---------------------------------------------------------------------------
# In-kernel-decode variant: decode each tile from codes, then the
# decoded-path distance matmul — LUT-free
# ---------------------------------------------------------------------------

def _decode_tile(cflat_ref, codes_ref, *, m: int, h: int, op_dtype):
    """(tile, dp) decoded tile as m per-codebook transposed-one-hot
    (h, tile) x Cflat_j (h, dp) matmuls, f32 accumulation. The decode
    cost amortizes over the whole query block — at bq >= 2*m*h/d the
    kernel approaches the decoded index's FLOP count while only codes
    live in HBM (VERDICT r1 item 1's in-kernel decode)."""
    tile = codes_ref.shape[1]
    iota_h = lax.broadcasted_iota(jnp.int32, (h, tile), 0)
    acc = jnp.zeros((tile, cflat_ref.shape[1]), jnp.float32)
    for j in range(m):
        w, sh = divmod(j, 4)
        word = codes_ref[w:w + 1, :]                      # (1, tile) i32
        c = lax.shift_right_logical(word, 8 * sh) & 0xFF
        ohT = (iota_h == c).astype(op_dtype)              # (h, tile)
        acc = acc + lax.dot_general(
            ohT, cflat_ref[j * h:(j + 1) * h, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _decode_x2(cflat_ref, nrm_ref, codes_ref, *, m: int, h: int,
               has_norms: bool, op_dtype) -> tuple[Array, Array]:
    """Decoded tile (tile, dp) at op_dtype + its per-row norm column
    ``x2`` (tile, 1): the decoded |x_hat|^2 (PQ/OPQ — subspaces are
    disjoint, so the in-kernel row norm IS the true norm) or the
    quantized-norms byte's table value (additive)."""
    Xt = _decode_tile(cflat_ref, codes_ref, m=m, h=h, op_dtype=op_dtype)
    if has_norms:
        tile = codes_ref.shape[1]
        w, sh = divmod(m, 4)
        word = codes_ref[w:w + 1, :]
        c = lax.shift_right_logical(word, 8 * sh) & 0xFF
        iota_h = lax.broadcasted_iota(jnp.int32, (h, tile), 0)
        ohT = (iota_h == c).astype(op_dtype)
        x2 = lax.dot_general(ohT, nrm_ref[:],
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[:, :1]
    else:
        x2 = jnp.sum(Xt * Xt, axis=1, keepdims=True)
    return Xt.astype(op_dtype), x2


def _decode_scores(qt_ref, cflat_ref, nrm_ref, codes_ref, t, *,
                   rows: int, bq: int, m: int, h: int, n: int,
                   has_norms: bool, op_dtype) -> Array:
    """Masked (tile, Bq) score block for the decode-mode kernels:
    ``qt`` carries -2*Q^T, so the block is ``Xt @ qt + x2``."""
    Xt, x2 = _decode_x2(cflat_ref, nrm_ref, codes_ref, m=m, h=h,
                        has_norms=has_norms, op_dtype=op_dtype)
    s = lax.dot_general(Xt, qt_ref[:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + x2
    tile = rows * LANES
    gid2 = t * tile + lax.broadcasted_iota(jnp.int32, (tile, bq), 0)
    return jnp.where(gid2 < n, s, jnp.inf)


def _codes_decode_kernel_packed(qt_ref, cflat_ref, nrm_ref, codes_ref,
                                outp_ref, bufp, dminp, sem, *,
                                rows: int, r: int, ntiles: int, bq: int,
                                m: int, h: int, n: int, has_norms: bool,
                                op_dtype, idbits: int, keep: int = 0):
    t = pl.program_id(1)
    s = _decode_scores(qt_ref, cflat_ref, nrm_ref, codes_ref, t,
                       rows=rows, bq=bq, m=m, h=h, n=n,
                       has_norms=has_norms, op_dtype=op_dtype)
    _select_insert_packed(s, t, bufp, dminp, sem, outp_ref, rows=rows,
                          r=r, ntiles=ntiles, bq=bq, idbits=idbits,
                          keep=keep)


def _codes_decode_kernel_packed_multi(qt_ref, cflat_ref, nrm_ref,
                                      codes_ref, outp_ref, bufp, dminp,
                                      sem, *, rows: int, r: int,
                                      ntiles: int, bq: int, qsuper: int,
                                      m: int, h: int, n: int,
                                      has_norms: bool, op_dtype,
                                      idbits: int, keep: int = 0):
    """Two-level query blocking: decode the tile ONCE per query
    SUPER-block of ``qsuper * bq`` queries, then run the distance
    matmul + selection per ``bq``-wide sub-block. The per-tile decode
    (m one-hot (h, tile) x (h, dp) matmuls) dominates the distance
    matmul ``m*h / bq``-fold at bq=256/m=8/h=256; amortizing it over
    the super-block divides that cost by ``qsuper`` while the running
    buffers stay at the measured-best (r, LANES, bq) selection shape
    (one buffer per sub-block, leading-indexed scratch)."""
    t = pl.program_id(1)
    qb = pl.program_id(0)
    Xt, x2 = _decode_x2(cflat_ref, nrm_ref, codes_ref, m=m, h=h,
                        has_norms=has_norms, op_dtype=op_dtype)
    tile = rows * LANES
    gid2 = t * tile + lax.broadcasted_iota(jnp.int32, (tile, bq), 0)
    pad = gid2 >= n
    for si in range(qsuper):
        s = lax.dot_general(Xt, qt_ref[:, si * bq:(si + 1) * bq],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + x2
        s = jnp.where(pad, jnp.inf, s)
        _select_insert_packed(
            s, t, bufp.at[si], dminp.at[si], sem, outp_ref, rows=rows,
            r=r, ntiles=ntiles, bq=bq, idbits=idbits, keep=keep,
            qstart=qb * (qsuper * bq) + si * bq)


def _codes_decode_kernel_packed_staged(qt_ref, cflat_ref, nrm_ref,
                                       codes_ref, outp_ref, bufp, stagep,
                                       dminp, sem, *, rows: int, r: int,
                                       ntiles: int, bq: int, m: int,
                                       h: int, n: int, has_norms: bool,
                                       op_dtype, idbits: int, keep: int,
                                       stage: int):
    """Decode-mode + staged buffer merge (see
    `scan_pallas._select_insert_packed_staged`)."""
    t = pl.program_id(1)
    s = _decode_scores(qt_ref, cflat_ref, nrm_ref, codes_ref, t,
                       rows=rows, bq=bq, m=m, h=h, n=n,
                       has_norms=has_norms, op_dtype=op_dtype)
    _select_insert_packed_staged(s, t, bufp, stagep, dminp, sem,
                                 outp_ref, rows=rows, r=r,
                                 ntiles=ntiles, bq=bq, idbits=idbits,
                                 keep=keep, stage=stage)


def _codes_decode_kernel_candidates(qt_ref, cflat_ref, nrm_ref,
                                    codes_ref, cand_ref, disc_ref,
                                    xt_scr, x2_scr, *, rows: int,
                                    bq: int, m: int, h: int, n: int,
                                    has_norms: bool, op_dtype,
                                    idbits: int, keep: int):
    """Two-pass decode scan, PASS 1: tile-major grid (t OUTER, qb
    inner), so each tile decodes ONCE for the whole query set — the
    one-level blocking (`qsuper`) still re-decoded every super-block,
    leaving the decode matmuls ~30% of device time at protocol shapes
    (VERDICT r2 item 2). Per (t, qb) step: distance matmul from the
    scratch-resident decoded tile, pack keys, pre-reduce to per-lane
    top-``keep``, and emit the (keep, LANES, bq) candidate slab plus
    the (1, LANES, bq) discard-min row — NO running buffer, no merge;
    pass 2 (`_cand_merge_kernel`) selects over the ~keep*ntiles/rows
    candidate rows instead of the full base."""
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        Xt, x2 = _decode_x2(cflat_ref, nrm_ref, codes_ref, m=m, h=h,
                            has_norms=has_norms, op_dtype=op_dtype)
        xt_scr[...] = Xt
        x2_scr[...] = x2

    t = pl.program_id(0)
    s = lax.dot_general(xt_scr[...], qt_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + x2_scr[...]
    tile = rows * LANES
    gid2 = t * tile + lax.broadcasted_iota(jnp.int32, (tile, bq), 0)
    s = jnp.where(gid2 < n, s, jnp.inf)
    kv = _row_key(s, t, rows=rows, bq=bq, idbits=idbits)
    kv, disc_min = _prered_topk(kv, keep)
    cand_ref[...] = kv
    disc_ref[...] = (disc_min[None] if disc_min is not None
                     else jnp.full((1, LANES, bq),
                                   jnp.iinfo(jnp.int32).max, jnp.int32))


def _cand_merge_kernel(cand_ref, disc_ref, outp_ref, bufp, dminp, sem,
                       *, rows2: int, r: int, ntiles2: int, bq: int,
                       keep2: int, ncand: int, ndisc: int, dr: int):
    """Two-pass decode scan, PASS 2: running top-r over the packed
    candidate keys pass 1 emitted (already total-order keys carrying
    global row ids — no re-packing), plus a min-reduce of the per-tile
    discard rows into the certificate accumulator. Pad rows beyond
    ``ncand``/``ndisc`` are uninitialized HBM — masked to imax here."""
    t = pl.program_id(1)
    imax = jnp.iinfo(jnp.int32).max

    @pl.when(t == 0)
    def _():
        bufp[:] = jnp.full(bufp.shape, imax, jnp.int32)
        dminp[:] = jnp.full(dminp.shape, imax, jnp.int32)

    kv = cand_ref[...]                               # (rows2, LANES, bq)
    row = (t * rows2
           + lax.broadcasted_iota(jnp.int32, (rows2, LANES, 1), 0))
    kv = jnp.where(row < ncand, kv, imax)
    dchunk = disc_ref[...]                           # (dr, LANES, bq)
    drow = (t * dr
            + lax.broadcasted_iota(jnp.int32, (dr, LANES, 1), 0))
    dchunk = jnp.where(drow < ndisc, dchunk, imax)
    dminp[:] = jnp.minimum(dminp[:],
                           jnp.min(dchunk, axis=0, keepdims=True))

    if keep2 and keep2 < rows2:
        kv, disc_min = _prered_topk(kv, keep2)
        if disc_min is not None:
            dminp[:] = jnp.minimum(dminp[:], disc_min[None])
        mv = jnp.concatenate([bufp[:], kv], axis=0)
        mv = _apply_network1(mv, _merge_stages(r + keep2))
    else:
        kv = _apply_network1(kv, _sort_stages(rows2), descending=True)
        mv = jnp.concatenate([bufp[:], kv], axis=0)
        mv = _apply_network1(mv, _merge_stages(r + rows2))
    bufp[:] = mv[:r]
    dminp[:] = jnp.minimum(dminp[:], mv[r:r + 1])

    qb = pl.program_id(0)

    @pl.when(t == ntiles2 - 1)
    def _():
        cp = pltpu.make_async_copy(
            bufp, outp_ref.at[:r, :, pl.ds(qb * bq, bq)], sem.at[0])
        cpd = pltpu.make_async_copy(
            dminp, outp_ref.at[r:, :, pl.ds(qb * bq, bq)], sem.at[1])
        cp.start()
        cpd.start()
        cp.wait()
        cpd.wait()


def build_decode_operands(C: Array, *, pq: bool, d: int,
                          norms_cbook: Array | None = None,
                          op_dtype=jnp.bfloat16
                          ) -> tuple[Array, Array]:
    """Flatten codebooks for the decode kernel: ``Cflat (m*h, dp)`` at
    the kernel operand dtype (block-diagonal subspace placement for
    PQ/OPQ), plus the quantized-norms table tiled to (h, LANES) (zeros
    when unused)."""
    m, h, ds = C.shape
    dp = cdiv(d, LANES) * LANES
    if pq:
        Cf = jnp.zeros((m * h, dp), jnp.float32)
        for j, (st, sz) in enumerate(splitarray(d, m)):
            Cf = Cf.at[j * h:(j + 1) * h, st:st + sz].set(C[j][:, :sz])
    else:
        Cf = jnp.pad(C.reshape(m * h, ds), ((0, 0), (0, dp - ds)))
    if norms_cbook is None:
        nrm = jnp.zeros((h, LANES), jnp.float32)
    else:
        nc = norms_cbook.reshape(-1)
        nrm = jnp.broadcast_to(
            jnp.pad(nc, (0, h - nc.size))[:, None], (h, LANES))
    return Cf.astype(op_dtype), nrm.astype(op_dtype)


@functools.partial(
    jax.jit, static_argnames=("k", "r", "bq", "tile", "verify", "pq",
                              "interpret", "op_dtype", "keep", "tail",
                              "stage", "vmem_mb", "qsuper"))
def pallas_scan_codes_decode_topk(Q: Array, Cflat: Array, nrm: Array,
                                  packed: Array, *, k: int, pq: bool,
                                  r: int = 28, bq: int = 256,
                                  tile: int = 2048, keep: int = 4,
                                  verify: bool = True,
                                  interpret: bool = False,
                                  op_dtype=jnp.bfloat16,
                                  tail: bool | None = None,
                                  stage: int = 0,
                                  vmem_mb: int | None = None,
                                  qsuper: int = 1
                                  ) -> tuple[Array, Array, Array]:
    """Top-k over packed codes via in-kernel decode (always pack32).

    Scores follow the same conventions as `pallas_scan_codes_topk`
    (exclude +|q|^2): PQ/OPQ get true-distance terms from the decoded
    row norm, additive models read the norms byte's table (``nrm``).
    Returns ``(scores, ids, flagged)`` with the exact min-discarded
    certificate.

    ``stage`` (needs ``keep``) merges the running buffer once every
    ``stage`` tiles instead of every tile (identical results, less VPU
    work — see `scan_pallas.pallas_scan_topk`). ``vmem_mb`` raises the
    compiler's scoped-VMEM limit, which the wide-``bq`` configs need:
    widening the query block divides the dominant per-tile decode cost
    by ``bq`` but grows the (r, 128, bq) running buffer past the 16 MB
    default. ``qsuper`` > 1 decodes each tile once per ``qsuper * bq``
    queries (two-level query blocking — same division of the decode
    cost WITHOUT widening the selection shape; the scratch grows
    ``qsuper``-fold instead, one (r, 128, bq) buffer per sub-block)."""
    nq, d = Q.shape
    mh, dp = Cflat.shape
    h = nrm.shape[0]
    m = mh // h
    n, nw = packed.shape
    has_norms = not pq
    if nw != cdiv(m + (1 if has_norms else 0), 4):
        raise ValueError(f"packed width {nw} inconsistent with m={m}")
    if k > r * LANES:
        raise ValueError(f"k={k} > r*128={r * LANES}")
    rows = tile // LANES
    if rows & (rows - 1):
        raise ValueError(f"tile/128={rows} must be a power of two")
    wide = keep if (keep and keep < rows) else rows
    if keep and (keep & (keep - 1) or keep > rows):
        raise ValueError(f"keep={keep} must be a power of two <= {rows}")
    if stage:
        if not keep or keep >= rows:
            raise ValueError("staged merge requires 0 < keep < tile/128")
        if qsuper > 1:
            raise ValueError("stage and qsuper are mutually exclusive")
        w = r + keep * stage
        if w & (w - 1):
            raise ValueError(f"r+keep*stage={w} must be a power of two")
        if (keep * stage) & (keep * stage - 1):
            raise ValueError(f"keep*stage={keep * stage} must be a "
                             "power of two (staging-sort width)")
    elif (r + wide) & (r + wide - 1):
        raise ValueError(f"r+{wide}={r + wide} must be a power of two")

    npad = cdiv(n, tile) * tile
    nqp = cdiv(nq, bq * qsuper) * (bq * qsuper)
    ntiles, nqb = npad // tile, nqp // (bq * qsuper)
    idbits = _pack_idbits(True, npad)
    if not idbits:
        raise ValueError(f"n={n} too large for packed row ids; shard")

    QT = jnp.pad(-2.0 * Q, ((0, nqp - nq), (0, dp - d))).astype(
        op_dtype).T                                       # (dp, nqp)
    PT = jnp.pad(packed, ((0, npad - n), (0, 0))).T       # (nw, npad)

    if qsuper > 1:
        kern = functools.partial(
            _codes_decode_kernel_packed_multi, rows=rows, r=r,
            ntiles=ntiles, bq=bq, qsuper=qsuper, m=m, h=h, n=n,
            has_norms=has_norms, op_dtype=op_dtype, idbits=idbits,
            keep=keep)
        scratch = [
            pltpu.VMEM((qsuper, r, LANES, bq), jnp.int32),
            pltpu.VMEM((qsuper, 1, LANES, bq), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif stage:
        kern = functools.partial(
            _codes_decode_kernel_packed_staged, rows=rows, r=r,
            ntiles=ntiles, bq=bq, m=m, h=h, n=n, has_norms=has_norms,
            op_dtype=op_dtype, idbits=idbits, keep=keep, stage=stage)
        scratch = [
            pltpu.VMEM((r, LANES, bq), jnp.int32),
            pltpu.VMEM((keep * stage, LANES, bq), jnp.int32),
            pltpu.VMEM((1, LANES, bq), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(
            _codes_decode_kernel_packed, rows=rows, r=r, ntiles=ntiles,
            bq=bq, m=m, h=h, n=n, has_norms=has_norms, op_dtype=op_dtype,
            idbits=idbits, keep=keep)
        scratch = [
            pltpu.VMEM((r, LANES, bq), jnp.int32),
            pltpu.VMEM((1, LANES, bq), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)
        if vmem_mb else None)
    outp = pl.pallas_call(
        kern,
        grid=(nqb, ntiles),
        in_specs=[
            pl.BlockSpec((dp, bq * qsuper), lambda qb, t: (0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mh, dp), lambda qb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, LANES), lambda qb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, tile), lambda qb, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((r + 1, LANES, nqp), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=cparams,
        interpret=interpret,
    )(QT, Cflat, nrm, PT)
    kk = min(k, n)
    if tail is None:
        tail = not interpret
    if tail:
        scores, ids, tau_k = _tail_candidates_pallas(
            outp[:r], nq, r, kk, idbits, interpret=interpret)
    else:
        scores, ids, tau_k = _packed_candidates(outp[:r], nq, r, kk,
                                                idbits)
    if not verify:
        return scores, ids, jnp.zeros((nq,), bool)
    flagged = jnp.any(outp[r, :, :nq] < tau_k[None, :], axis=0)
    return scores, ids, flagged


@functools.partial(
    jax.jit, static_argnames=("k", "pq", "r", "bq", "tile", "keep",
                              "keep2", "rows2", "verify", "interpret",
                              "op_dtype", "tail", "vmem_mb"))
def pallas_scan_codes_decode_topk_2p(Q: Array, Cflat: Array, nrm: Array,
                                     packed: Array, *, k: int, pq: bool,
                                     r: int = 28, bq: int = 256,
                                     tile: int = 8192, keep: int = 4,
                                     keep2: int | None = None,
                                     rows2: int = 32,
                                     verify: bool = True,
                                     interpret: bool = False,
                                     op_dtype=jnp.bfloat16,
                                     tail: bool | None = None,
                                     vmem_mb: int | None = 64
                                     ) -> tuple[Array, Array, Array]:
    """Two-pass in-kernel-decode scan: decode each tile ONCE for the
    whole query set.

    Pass 1 (`_codes_decode_kernel_candidates`) iterates tiles on the
    OUTER grid dim: the decoded tile lives in scratch across all query
    blocks, so the decode matmuls cost ntiles decodes total instead of
    ntiles * nqb/qsuper (the round-2 `qsuper` kernel's residual ~30%
    of device time). Each step emits per-lane top-``keep`` packed
    candidates + the discard-min row to HBM ((keep+1)/rows of the
    score volume). Pass 2 (`_cand_merge_kernel`) runs the classic
    running top-r selection over the candidate rows only — ~keep *
    ntiles/rows of the base — and reduces the discard rows into the
    same exact certificate. Same contract as
    `pallas_scan_codes_decode_topk`: (scores ex-|q|^2, ids, flagged),
    exact-unless-flagged for the truncated op_dtype scores."""
    nq, d = Q.shape
    mh, dp = Cflat.shape
    h = nrm.shape[0]
    m = mh // h
    n, nw = packed.shape
    has_norms = not pq
    if nw != cdiv(m + (1 if has_norms else 0), 4):
        raise ValueError(f"packed width {nw} inconsistent with m={m}")
    if k > r * LANES:
        raise ValueError(f"k={k} > r*128={r * LANES}")
    rows = tile // LANES
    if rows & (rows - 1):
        raise ValueError(f"tile/128={rows} must be a power of two")
    if not keep or keep & (keep - 1) or keep > rows:
        raise ValueError(f"keep={keep} must be a power of two <= {rows}")
    if rows2 & (rows2 - 1) or rows2 < keep:
        raise ValueError(f"rows2={rows2} must be a power of two "
                         f">= keep={keep}")
    keep2 = keep if keep2 is None else keep2
    wide2 = keep2 if (keep2 and keep2 < rows2) else rows2
    if keep2 and (keep2 & (keep2 - 1) or keep2 > rows2):
        raise ValueError(f"keep2={keep2} must be a power of two "
                         f"<= {rows2}")
    if (r + wide2) & (r + wide2 - 1):
        raise ValueError(f"r+{wide2}={r + wide2} must be a power of two")

    npad = cdiv(n, tile) * tile
    nqp = cdiv(nq, bq) * bq
    ntiles, nqb = npad // tile, nqp // bq
    idbits = _pack_idbits(True, npad)
    if not idbits:
        raise ValueError(f"n={n} too large for packed row ids; shard")

    ncand = ntiles * keep
    ntiles2 = cdiv(ncand, rows2)
    ncandP = ntiles2 * rows2
    dr = cdiv(ntiles, ntiles2)
    ndiscP = ntiles2 * dr

    QT = jnp.pad(-2.0 * Q, ((0, nqp - nq), (0, dp - d))).astype(
        op_dtype).T                                   # (dp, nqp)
    PT = jnp.pad(packed, ((0, npad - n), (0, 0))).T   # (nw, npad)

    kern1 = functools.partial(
        _codes_decode_kernel_candidates, rows=rows, bq=bq, m=m, h=h,
        n=n, has_norms=has_norms, op_dtype=op_dtype, idbits=idbits,
        keep=keep)
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024) if vmem_mb else None)
    cand, disc = pl.pallas_call(
        kern1,
        grid=(ntiles, nqb),                # t OUTER, qb inner
        in_specs=[
            pl.BlockSpec((dp, bq), lambda t, qb: (0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mh, dp), lambda t, qb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, LANES), lambda t, qb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, tile), lambda t, qb: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((keep, LANES, bq), lambda t, qb: (t, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES, bq), lambda t, qb: (t, 0, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ncandP, LANES, nqp), jnp.int32),
            jax.ShapeDtypeStruct((ndiscP, LANES, nqp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, dp), op_dtype),
            pltpu.VMEM((tile, 1), jnp.float32),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(QT, Cflat, nrm, PT)

    kern2 = functools.partial(
        _cand_merge_kernel, rows2=rows2, r=r, ntiles2=ntiles2, bq=bq,
        keep2=keep2, ncand=ncand, ndisc=ntiles, dr=dr)
    outp = pl.pallas_call(
        kern2,
        grid=(nqb, ntiles2),               # qb outer, t2 inner
        in_specs=[
            pl.BlockSpec((rows2, LANES, bq), lambda qb, t2: (t2, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dr, LANES, bq), lambda qb, t2: (t2, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((r + 1, LANES, nqp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((r, LANES, bq), jnp.int32),
            pltpu.VMEM((1, LANES, bq), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(cand, disc)

    kk = min(k, n)
    if tail is None:
        tail = not interpret
    if tail:
        scores, ids, tau_k = _tail_candidates_pallas(
            outp[:r], nq, r, kk, idbits, interpret=interpret)
    else:
        scores, ids, tau_k = _packed_candidates(outp[:r], nq, r, kk,
                                                idbits)
    if not verify:
        return scores, ids, jnp.zeros((nq,), bool)
    flagged = jnp.any(outp[r, :, :nq] < tau_k[None, :], axis=0)
    return scores, ids, flagged


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("k", "r", "bq", "tile", "verify",
                              "interpret", "lut_dtype", "pack", "keep",
                              "tail"))
def pallas_scan_codes_topk(T: Array, packed: Array, *, k: int,
                           r: int = 48, bq: int = 128, tile: int = 2048,
                           verify: bool = True, interpret: bool = False,
                           lut_dtype=jnp.bfloat16, pack: bool = False,
                           keep: int = 0, tail: bool | None = None
                           ) -> tuple[Array, Array, Array]:
    """Exact-unless-flagged top-k over packed codes.

    Args:
      T: (m', h, nq) LUT stack from `build_luts`.
      packed: (n, nw) int32 packed codes from `pack_codes`.
      lut_dtype: matmul operand dtype inside the kernel (tables and
        one-hots). f32 accumulation either way; verify uses the same.

    Returns ``(scores (nq, k), ids (nq, k), flagged (nq,) bool)`` —
    scores exclude the +|q|^2 constant (front-ends add it)."""
    mprime, h, nq = T.shape
    n, nw = packed.shape
    if nw != cdiv(mprime, 4):
        raise ValueError(f"packed width {nw} != ceil(m'={mprime}/4)")
    if k > r * LANES:
        raise ValueError(f"k={k} > r*128={r * LANES}")
    rows = tile // LANES
    if rows & (rows - 1):
        raise ValueError(f"tile/128={rows} must be a power of two")
    if keep:
        if not pack:
            raise ValueError("keep pre-reduction requires pack=True")
        if keep & (keep - 1) or keep > rows:
            raise ValueError(f"keep={keep} must be a power of two "
                             f"<= tile/128={rows}")
        if (r + keep) & (r + keep - 1):
            raise ValueError(f"r+keep={r + keep} must be a power of "
                             "two (bitonic merge width)")
    elif (r + rows) & (r + rows - 1):
        raise ValueError(f"r+tile/128={r + rows} must be a power of two")

    npad = cdiv(n, tile) * tile
    nqp = cdiv(nq, bq) * bq
    ntiles, nqb = npad // tile, nqp // bq
    idbits = _pack_idbits(pack, npad)

    # Tables ship at lut_dtype (halves the per-visit T-block DMA and
    # its double-buffered VMEM in bf16 mode); codes ship transposed.
    Tf = T.reshape(mprime * h, nq).astype(lut_dtype)
    Tf = jnp.pad(Tf, ((0, 0), (0, nqp - nq)))
    PT = jnp.pad(packed, ((0, npad - n), (0, 0))).T        # (nw, npad)

    in_specs = [
        pl.BlockSpec((mprime * h, bq), lambda qb, t: (0, qb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nw, tile), lambda qb, t: (0, t),
                     memory_space=pltpu.VMEM),
    ]
    kk = min(k, n)

    if idbits:
        kern = functools.partial(_codes_scan_kernel_packed, rows=rows,
                                 r=r, ntiles=ntiles, bq=bq,
                                 mprime=mprime, h=h, n=n,
                                 lut_dtype=lut_dtype, idbits=idbits,
                                 keep=keep)
        outp = pl.pallas_call(
            kern,
            grid=(nqb, ntiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((r + 1, LANES, nqp),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((r, LANES, bq), jnp.int32),
                pltpu.VMEM((1, LANES, bq), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(Tf, PT)
        if tail is None:
            tail = not interpret
        if tail:
            scores, ids, tau_k = _tail_candidates_pallas(
                outp[:r], nq, r, kk, idbits, interpret=interpret)
        else:
            scores, ids, tau_k = _packed_candidates(outp[:r], nq, r,
                                                    kk, idbits)
        if not verify:
            return scores, ids, jnp.zeros((nq,), bool)
        # in-scan EXACT certificate (min discarded/evicted key), same
        # argument as scan_pallas: no counting pass in packed mode
        flagged = jnp.any(outp[r, :, :nq] < tau_k[None, :], axis=0)
        return scores, ids, flagged
    else:
        kern = functools.partial(_codes_scan_kernel, rows=rows, r=r,
                                 ntiles=ntiles, bq=bq, mprime=mprime,
                                 h=h, n=n, lut_dtype=lut_dtype)
        outv, outi = pl.pallas_call(
            kern,
            grid=(nqb, ntiles),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r, LANES, nqp), jnp.float32),
                jax.ShapeDtypeStruct((r, LANES, nqp), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((r, LANES, bq), jnp.float32),
                pltpu.VMEM((r, LANES, bq), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(Tf, PT)
        cand_v = outv[:, :, :nq].reshape(r * LANES, nq).T
        cand_i = candidate_ids(outi, nq, r)
        neg, loc = lax.top_k(-cand_v, kk)
        scores = -neg
        ids = jnp.take_along_axis(cand_i, loc, axis=1)
        tau = jnp.full((nqp,), -jnp.inf, jnp.float32)
        tau = tau.at[:nq].set(scores[:, kk - 1])

    if not verify:
        return scores, ids, jnp.zeros((nq,), bool)

    tau = jnp.broadcast_to(tau[None, :], (LANES, nqp))
    vkern = functools.partial(_codes_verify_kernel, rows=rows,
                              ntiles=ntiles, mprime=mprime, h=h, n=n,
                              lut_dtype=lut_dtype, idbits=idbits)
    cnt = pl.pallas_call(
        vkern,
        grid=(nqb, ntiles),
        in_specs=in_specs + [
            pl.BlockSpec((LANES, bq), lambda qb, t: (0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, LANES, bq), lambda qb, t: (0, 0, qb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, LANES, nqp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LANES, bq), jnp.int32),
                        pltpu.VMEM((LANES, bq), jnp.int32)],
        interpret=interpret,
    )(Tf, PT, tau)
    flagged = jnp.any(cnt[0, :, :nq] > r, axis=0)
    return scores, ids, flagged


def xla_lut_scan(T: Array, B: Array, k: int,
                 lut_dtype=jnp.float32) -> tuple[Array, Array]:
    """Gather-based LUT scan in XLA — the exact-fallback / reference
    implementation of the same scores (`deps/src/linscan_aqd.cpp:37-102`
    accumulate, vectorized). Used for flagged queries and as the
    equivalence oracle in tests."""
    mprime, h, nq = T.shape
    n = B.shape[0]
    Tc = T.astype(lut_dtype).astype(jnp.float32)
    flat = jnp.transpose(Tc, (2, 0, 1)).reshape(nq, mprime * h)
    idx = (B + jnp.arange(mprime, dtype=B.dtype)[None, :] * h)  # (n, m')
    s = jnp.sum(flat[:, idx], axis=2)                           # (nq, n)
    neg, ids = lax.top_k(-s, min(k, n))
    return -neg, ids.astype(jnp.int32)


class CodesIndex:
    """Scan-ready packed-code index: ~m bytes/vector resident.

    Build once (`build_codes_index`), search many times; each search
    builds the per-query LUT stack in XLA and runs the fused kernel."""

    def __init__(self, packed: Array, mprime: int, C: Array, *,
                 pq: bool, d: int, norms_cbook: Array | None):
        self.packed, self.mprime, self.C = packed, mprime, C
        self.pq, self.d, self.norms_cbook = pq, d, norms_cbook
        self.n = packed.shape[0]
        self._decode_ops: dict = {}
        # jitted segmented-scan executables keyed by (Q shape, k,
        # config): eager retrace cost ~0.7-1.0 s per 1e8-scale call
        self._seg_fns: dict = {}
        # per-segment sub-indexes of the big-base LUT-mode fallback,
        # keyed by segment start: reused across calls so the packed
        # device slices (and the sub-indexes' own caches) are built
        # once, not per call (ADVICE r4). Memory: the slices together
        # hold a second copy of `packed` once every segment has been
        # visited — acceptable for this rarely-taken fallback (decode
        # mode is the at-scale default and never populates this)
        self._lut_subs: dict = {}

    def decode_operands(self, d: int, op_dtype):
        """Cached `build_decode_operands` result: the flattened
        codebooks depend only on (C, d, dtype), but rebuilding them
        eagerly cost ~m+2 device dispatches per search call — a
        measurable slice of the 2.2-2.4x e2e/kernel wall gap on the
        axon tunnel (demos/bench_codes_e2e_gap.py, 2026-08-20)."""
        key = (d, jnp.dtype(op_dtype).name)
        if key not in self._decode_ops:
            self._decode_ops[key] = build_decode_operands(
                self.C, pq=self.pq, d=d, norms_cbook=self.norms_cbook,
                op_dtype=op_dtype)
        return self._decode_ops[key]


def build_codes_index(C: Array, B: Array, *, pq: bool = False,
                      d: int | None = None,
                      norms_cbook: Array | None = None,
                      norms_codes: Array | None = None) -> CodesIndex:
    if (norms_cbook is None) != (norms_codes is None):
        raise ValueError("norms_cbook and norms_codes go together")
    if not pq and norms_cbook is None:
        raise ValueError(
            "additive codebooks need a quantized-norms byte for the "
            "code-resident scan (reference src/Linscan.jl:118-157); "
            "train one via rayuela_tpu.search.norms or use the decoded "
            "scan_pallas path")
    B = jnp.asarray(B, jnp.int32)
    packed = pack_codes(B, norms_codes)
    mprime = B.shape[1] + (0 if norms_codes is None else 1)
    return CodesIndex(packed, mprime, jnp.asarray(C), pq=pq,
                      d=d if d is not None else -1,
                      norms_cbook=norms_cbook)


# decode-mode segment size: 2^16 row ids x 128 lanes (test-patchable)
_DECODE_SEG = (1 << 16) * LANES

# exact-rescue kernel shape: keep=0 full per-tile sort at a deep buffer
# (flag probability ~0 at protocol shapes: a lane must hold > 48 of the
# query's top-k within one segment)
_RESCUE_R, _RESCUE_TILE = 48, 2048


def _rescue_segments(Qj, Cf, nrm, index, best_s, best_i, fl_seg, bounds,
                     k, *, lut_dtype, interpret, lut_rescan):
    """Exact-kernel repair of flagged (query, segment) pairs.

    The certificate is per (query, segment): a flag taints only that
    segment's contribution to the query's merged top-k list (the other
    segments' lists were exact, and exact merges never evict a true
    top-k element). So for each flagged segment, the flagged queries
    re-scan THAT ONE segment with the deep exact kernel (keep=0 full
    per-tile sort, r=48), the segment's old entries are masked out of
    the merged list, and the exact per-segment top-k merges back in.
    Cost: one small kernel call per flagged segment over only the
    flagged queries — instead of the XLA gather scan over ALL segments
    (~100x a kernel call at 1e9 codes), which remains only as the
    last-resort fallback when the rescue kernel itself flags
    (VERDICT r2 item 5)."""
    still = np.zeros(fl_seg.shape[1], bool)
    for si, (start, stop) in enumerate(bounds):
        qs = np.nonzero(fl_seg[si])[0]
        if qs.size == 0:
            continue
        kseg = min(k, stop - start)
        if kseg > _RESCUE_R * LANES:
            still[qs] = True          # beyond the rescue buffer: XLA
            continue
        # pad the ragged flagged batch to a power of two to bound
        # recompiles (same trick as scan_pallas.search's premin rescue)
        nf = 1 << max(0, int(qs.size - 1).bit_length())
        qpad = np.pad(qs, (0, nf - qs.size), mode="edge")
        s2, i2, f2 = pallas_scan_codes_decode_topk(
            Qj[qpad], Cf, nrm, index.packed[start:stop], k=kseg,
            pq=index.pq, r=_RESCUE_R, bq=128, tile=_RESCUE_TILE,
            keep=0, verify=True, interpret=interpret,
            op_dtype=lut_dtype, stage=0, qsuper=1)
        f2 = np.asarray(f2)[:qs.size]
        sel = np.arange(qs.size)
        bs, bi = best_s[qs], best_i[qs]
        # mask the tainted segment's old entries, then merge its exact
        # list back in (masking avoids duplicate ids in the union)
        inseg = (bi >= start) & (bi < stop)
        cs = jnp.concatenate([jnp.where(inseg, jnp.inf, bs), s2[sel]],
                             axis=1)
        ci = jnp.concatenate([bi, i2[sel] + start], axis=1)
        neg, loc = lax.top_k(-cs, min(k, cs.shape[1]))
        best_s = best_s.at[qs].set(-neg)
        best_i = best_i.at[qs].set(jnp.take_along_axis(ci, loc, axis=1))
        if f2.any():
            still[qs[f2]] = True
    if still.any():
        qidx = np.nonzero(still)[0]
        s2, i2 = lut_rescan(qidx, bounds, lambda a, b: min(k, b - a))
        best_s = best_s.at[qidx].set(s2)
        best_i = best_i.at[qidx].set(i2)
    return best_s, best_i


def _xla_lut_scan_tiled(index: "CodesIndex", Qj: Array, k: int, d: int,
                        lut_dtype, qblock: int = 128,
                        seg: int = 1 << 19) -> tuple[Array, Array]:
    """Exact XLA LUT oracle over the whole base, tiled over base
    segments x query blocks with an exact top-k merge, so the per-call
    (qblock, seg) score matrix and its (qblock, seg, m') gather
    intermediate stay ~2 GB instead of scaling with nq*n. The segment
    loop is OUTER so each base segment is sliced + unpacked exactly
    once (unpacking per query block redid that ~nq/qblock = ~78x at
    nq=1e4 — ADVICE r4). Scores exclude the +|q|^2 constant (callers
    add it)."""
    nq = Qj.shape[0]
    blocks = [(q0, min(q0 + qblock, nq))
              for q0 in range(0, nq, qblock)]
    Ts = [build_luts(index.C, Qj[a:b], pq=index.pq, d=d,
                     norms_cbook=index.norms_cbook) for a, b in blocks]
    bs: list = [None] * len(blocks)
    bi: list = [None] * len(blocks)
    for st in range(0, index.n, seg):
        stop = min(st + seg, index.n)
        Bseg = unpack_codes(index.packed[st:stop], index.mprime)
        for j in range(len(blocks)):
            s2, i2 = xla_lut_scan(Ts[j], Bseg, min(k, stop - st),
                                  lut_dtype=lut_dtype)
            i2 = i2 + st
            if bs[j] is None:
                bs[j], bi[j] = s2, i2
            else:
                cs = jnp.concatenate([bs[j], s2], axis=1)
                ci = jnp.concatenate([bi[j], i2], axis=1)
                neg, loc = lax.top_k(-cs, min(k, cs.shape[1]))
                bs[j] = -neg
                bi[j] = jnp.take_along_axis(ci, loc, axis=1)
    return jnp.concatenate(bs, 0), jnp.concatenate(bi, 0)


# in-graph rescue slots for the fused single-segment path (cost when
# nothing flags: one extra nr-query pass, ~nr/nq of the main scan)
_FUSED_RESCUE_NR = 128


@functools.partial(
    jax.jit, static_argnames=("k", "pq", "r", "bq", "tile", "keep",
                              "rows2", "twopass", "qsuper", "stage",
                              "op_dtype", "vmem_mb", "interpret"))
def _scan_segment_fused(Q: Array, Cflat: Array, nrm: Array,
                        packed: Array, *, k: int, pq: bool, r: int,
                        bq: int, tile: int, keep: int, rows2: int,
                        twopass: bool, qsuper: int, stage: int,
                        op_dtype, vmem_mb: int | None,
                        interpret: bool = False
                        ) -> tuple[Array, Array, Array]:
    """One-dispatch single-segment decode-mode scan: |q|^2 fold AND
    the exact-kernel rescue of certificate-flagged queries both happen
    in-graph, so the host does exactly one launch plus one flag sync
    per search call. Before fusing, the eager per-call chain (operand
    rebuild + q2 + kernel + score add + a host-side rescue dispatch
    whenever >=1 of 1e4 queries flagged) measured 2.2-2.4x the bare
    kernel's wall through the axon tunnel at NQ=1e4
    (demos/bench_codes_e2e_gap.py, 2026-08-20). The in-graph rescue
    mirrors `scan_pallas._scan_premin_inline`: up to
    ``_FUSED_RESCUE_NR`` flagged queries re-run through the deep exact
    kernel (keep=0 full per-tile sort, the `_rescue_segments` anchor)
    and scatter back; the returned flag vector keeps only what remains
    unproven, which the host repairs. A second ``hard`` mask marks the
    queries whose RESCUE kernel itself flagged: re-running them through
    `_rescue_segments` (same r=48/keep=0/tile config) would
    deterministically flag again and waste a full-base kernel pass, so
    the host sends them straight to the XLA LUT oracle. Returns scores
    WITH the +|q|^2 constant (true squared distances for PQ)."""
    nq = Q.shape[0]
    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)
    if twopass:
        s, i, fl = pallas_scan_codes_decode_topk_2p(
            Q, Cflat, nrm, packed, k=k, pq=pq, r=r, bq=bq, tile=tile,
            keep=keep, keep2=0, rows2=rows2, verify=True,
            op_dtype=op_dtype, vmem_mb=vmem_mb, interpret=interpret)
    else:
        s, i, fl = pallas_scan_codes_decode_topk(
            Q, Cflat, nrm, packed, k=k, pq=pq, r=r, bq=bq, tile=tile,
            keep=keep, verify=True, op_dtype=op_dtype, stage=stage,
            vmem_mb=vmem_mb, qsuper=qsuper, interpret=interpret)
    if k > _RESCUE_R * LANES:
        # beyond the rescue buffer: host path (nothing rescue-flagged)
        return s + q2, i, fl, jnp.zeros_like(fl)
    nr = min(_FUSED_RESCUE_NR, nq)
    fli = fl.astype(jnp.int32)
    _, qidx = lax.top_k(fli, nr)             # flagged-first, distinct
    # rescue query-block width must stay LANE-ALIGNED (Mosaic rejects
    # non-128-multiple minor-axis DMA strides)
    bq2 = max(LANES, -(-nr // LANES) * LANES)
    s2, i2, f2 = pallas_scan_codes_decode_topk(
        Q[qidx], Cflat, nrm, packed, k=k, pq=pq, r=_RESCUE_R, bq=bq2,
        tile=_RESCUE_TILE, keep=0, verify=True, op_dtype=op_dtype,
        interpret=interpret)
    sel = fl[qidx]                           # real flags among slots
    s = s.at[qidx].set(jnp.where(sel[:, None], s2, s[qidx]))
    i = i.at[qidx].set(jnp.where(sel[:, None], i2, i[qidx]))
    rescued = jnp.zeros((nq,), bool).at[qidx].set(sel & ~f2)
    hard = jnp.zeros((nq,), bool).at[qidx].set(sel & f2)
    return s + q2, i, fl & ~rescued, hard


@functools.partial(
    jax.jit, static_argnames=("k", "pq", "d", "r", "bq", "tile",
                              "keep", "pack", "lut_dtype", "has_norms"))
def _scan_lut_fused(Q: Array, C: Array, nc: Array, packed: Array, *,
                    k: int, pq: bool, d: int, r: int, bq: int,
                    tile: int, keep: int, pack: bool, lut_dtype,
                    has_norms: bool) -> tuple[Array, Array, Array]:
    """One-dispatch LUT-mode scan: table build + kernel + |q|^2 add
    fused into a single launch (same tunnel-overhead rationale as
    `_scan_segment_fused`). ``nc`` is the quantized-norms codebook or
    an empty placeholder when ``has_norms`` is False."""
    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)
    T = build_luts(C, Q, pq=pq, d=d,
                   norms_cbook=nc if has_norms else None)
    s, i, fl = pallas_scan_codes_topk(
        T, packed, k=k, r=r, bq=bq, tile=tile, verify=True,
        lut_dtype=lut_dtype, pack=pack, keep=keep)
    return s + q2, i, fl


def _codes_auto_config(k: int, nq: int, pack: bool, mode: str,
                       mprime: int | None = None):
    """Measured-best (r, bq, tile, keep, stage, qsuper) for the
    code-resident kernels (1x v5e sweeps, demos/bench_codes_tune.py
    2026-08-17: knn=1000 11.1k qps at (24, 256, 1024), knn=100 15.9k
    at (8, 512, 1024); the LUT block scales with bq, so bq caps at 512
    in lut mode). Decode mode amortizes its per-tile decode over
    bq * qsuper queries, so it prefers the wider blocks; ``stage`` > 0
    runs the buffer merge once per `stage` tiles; ``qsuper`` > 1
    decodes once per super-block of sub-blocks (two-level blocking)."""
    if not pack:
        return (16 if k <= 512 else 48), 128, 2048, 0, 0, 1
    if mode == "decode":
        # v5e sweeps (demos/bench_codes_decode.py +
        # /tmp/sweep_codes_tail.py post-tail-merge, 2026-08-17): m8
        # k=1000 29.6k qps at (28,256,4096,4); k=100 39.6k at
        # (14,512,2048,2). m16's wider score spread overflows keep=2
        # per-tile often enough that its flagged-rescan cost dominates
        # (18.4k e2e); keep=4 avoids it: 30.8k at (12,512,2048,4),
        # and costs m8 only ~3% — used whenever m' > 11.
        # qsuper sweeps (demos/bench_codes_qsuper{,2,3}.py 2026-08-18):
        # two-level blocking beats qs1 everywhere — m8 knn=1000 39.2k
        # qps at qs8 (was 29.4k in-run), knn=100 48.7k at keep2/qs4
        # (was 17.9-39.6k); m16 knn=1000 qs4, knn=100 qs2. Beyond the
        # winner the scratch-resident buffers crowd out DMA overlap
        # (m8 k=1000 qs16 33.3k < qs8).
        small = mprime is None or mprime <= 11
        if k <= 512:
            r, bq, tile, keep, qsuper = ((14, 512, 2048, 2, 4)
                                         if small
                                         else (12, 512, 2048, 4, 2))
        else:
            # tile=8192 wins only the m8-class k>512 config (+9%
            # in-run, /tmp/sweep_codes_tile.py); m16-class and the
            # k<=512 classes measured best at their original tiles
            r, bq, keep = 28, 256, 4
            tile, qsuper = (8192, 8) if small else (4096, 4)
        stage = 0
        bqnq = max(128, 1 << (nq - 1).bit_length())
        while qsuper > 1 and bq * qsuper > bqnq:
            qsuper //= 2          # tiny query batches: no super-block
        return r, min(bq, bqnq), tile, keep, stage, qsuper
    elif k <= 512:
        r, bq, tile, keep, stage = 14, 512, 1024, 2, 0
    else:
        r, bq, tile, keep, stage = 28, 256, 1024, 4, 0
    bqnq = max(128, 1 << (nq - 1).bit_length())
    return r, min(bq, bqnq), tile, keep, stage, 1


def search_codes(index: CodesIndex, Q: Array, k: int, *,
                 r: int | None = None, bq: int | None = None,
                 tile: int | None = None, interpret: bool = False,
                 lut_dtype=jnp.bfloat16, pack: bool | None = None,
                 keep: int | None = None, mode: str | None = None,
                 stage: int | None = None,
                 vmem_mb: int | None = None,
                 qsuper: int | None = None,
                 twopass: bool | None = None) -> tuple[Array, Array]:
    """Exact top-k (for the kernel scores) over a packed-code index:
    fused kernel + XLA LUT re-scan for flagged queries. Returns true
    squared distances for PQ/additive-with-norms conventions (adds the
    +|q|^2 constant, like `scan_pallas.search`). ``pack`` (default: on
    for compiled TPU runs) packs (score, row id) into one int32
    selection key — exact for the truncated scores.

    ``mode``: ``"decode"`` (default where packed row ids fit — the
    in-kernel-decode kernel, 1.4-1.7x the LUT mode on hardware) or
    ``"lut"`` (per-query tables; also the fallback for shard sizes
    beyond the packed-id range). ``r``/``bq``/``tile``/``keep``
    default to the measured-best configuration per mode
    (`_codes_auto_config`)."""
    k = min(k, index.n)       # never return padded (inf, fake-id) rows
    d = Q.shape[1] if index.d in (-1, None) else index.d
    if mode == "lut" and index.n > _DECODE_SEG:
        # LUT mode's packed row ids span the same 16-bit range as
        # decode mode (8.4M rows/call) but its fused front-end is
        # unsegmented — route big bases through per-segment recursion
        # with an exact top-k merge (this mode is the fallback for
        # shards beyond the packed-id range, so crashing on exactly
        # those sizes was a bug; found by the round-4 1e8 LUT A/B)
        best_s = best_i = None
        for st in range(0, index.n, _DECODE_SEG):
            stop = min(st + _DECODE_SEG, index.n)
            sub = index._lut_subs.get(st)
            if sub is None:
                sub = CodesIndex(index.packed[st:stop], index.mprime,
                                 index.C, pq=index.pq, d=index.d,
                                 norms_cbook=index.norms_cbook)
                index._lut_subs[st] = sub
            s, i = search_codes(sub, Q, min(k, stop - st), r=r, bq=bq,
                                tile=tile, interpret=interpret,
                                lut_dtype=lut_dtype, pack=pack,
                                keep=keep, mode="lut", stage=stage,
                                vmem_mb=vmem_mb)
            i = i + st
            if best_s is None:
                best_s, best_i = s, i
            else:
                cs = jnp.concatenate([best_s, s], axis=1)
                ci = jnp.concatenate([best_i, i], axis=1)
                neg, loc = lax.top_k(-cs, k)
                best_s = -neg
                best_i = jnp.take_along_axis(ci, loc, axis=1)
        return best_s, best_i
    if k > 96 * LANES and r is None:
        # beyond any kernel config's per-lane buffer: exact XLA LUT
        # scan (out-of-protocol regime — the reference caps at 1000).
        # Tiled over query blocks x base segments: one monolithic
        # xla_lut_scan materializes an (nq, n) score matrix plus an
        # (nq, n, m') gather intermediate — OOM at nq=1e4, n>=1e6.
        Qj = jnp.asarray(Q)
        s, i = _xla_lut_scan_tiled(index, Qj, k, d, lut_dtype)
        return s + jnp.sum(Qj * Qj, axis=-1, keepdims=True), i
    if pack is None:
        pack = not interpret
    if mode is None:
        mode = "decode"
    ar, abq, atile, akeep, astage, aqsuper = _codes_auto_config(
        k, Q.shape[0], pack, mode, index.mprime)
    r_explicit = r is not None
    keep_explicit = keep is not None
    explicit = (r is not None or keep is not None or tile is not None
                or bq is not None)
    if stage is None:
        # explicit config overrides keep per-tile merge semantics
        stage = 0 if explicit else astage
    if qsuper is None:
        qsuper = 1 if (explicit or stage) else aqsuper
    r = ar if r is None else r
    bq = abq if bq is None else bq
    tile = atile if tile is None else tile
    keep = akeep if keep is None else keep
    if vmem_mb is None and (stage or tile > 4096 or bq > 512
                            or qsuper > 1):
        # beyond the 16 MB scoped-VMEM default; the qsuper scratch
        # (qsuper, r, 128, bq) wants headroom for DMA overlap too
        # (m16 qs4 at 48 MB runs 26% slower than at 128 MB)
        vmem_mb = 128 if qsuper > 1 else 64
    small_m = index.mprime <= 11
    if twopass is None and mode == "decode" and not explicit \
            and not stage and not interpret:
        # two-pass decode-once kernel: measured best everywhere on 1x
        # v5e (2026-08-19, /tmp/exp_2pass2.log, interleaved NQ=1e4):
        # m8 k=1000 66.1k qps vs 43.8k classic (+51%), m8 k=100 74.9k
        # vs 62.1k, m16 k=1000 35.9k vs 26.2k, m16 k=100 44.2k vs
        # 36.6k. Gated on the pass-1 candidate array fitting HBM
        # comfortably (ntiles*keepP*128*nqp*4 bytes per segment).
        seg_n = min(index.n, _DECODE_SEG)
        keep_est = 2 if k <= 512 else 4
        bq_est = 512 if (small_m or k <= 512) else 256
        nqp_est = cdiv(Q.shape[0], bq_est) * bq_est
        cand_bytes = (cdiv(seg_n, 8192) * keep_est * LANES
                      * nqp_est * 4)
        # k > 4096 would need r > rows2=32 in pass 2 (unswept)
        twopass = cand_bytes <= (3 << 30) and k <= 4096
    if twopass:
        bqnq = max(128, 1 << (Q.shape[0] - 1).bit_length())
        tile = 8192 if not explicit else tile
        bq = (min(512 if (small_m or k <= 512) else 256, bqnq)
              if not explicit else bq)
        if vmem_mb is None:
            vmem_mb = 100 if bq > 256 else 64
    if mode == "decode":
        # Packed row ids span 16 bits (8.4M rows/call); bigger bases
        # run in segments with an exact host-side top-k merge — the
        # single-chip analogue of the reference's nsplits tiling, at
        # code-resident memory (no decode ever materializes).
        seg = _DECODE_SEG
        Cf, nrm = index.decode_operands(d, lut_dtype)
        Qj = jnp.asarray(Q)

        def q2f():
            # |q|^2 only materializes off the fused fast path (the
            # fused kernels fold it in-graph)
            return jnp.sum(Qj * Qj, axis=-1, keepdims=True)

        def scan_segment_with(Qv, Cfv, nrmv, packed_seg, kseg):
            if twopass:
                # pass 2 FULL-SORTS its candidate windows (keep2=0):
                # a keep2 pre-reduction there drops all but keep2 of
                # each window's ~rows2/keep tiles' worth of candidates
                # and the exact certificate flags the losses en masse
                # (measured 19/64 queries vs 1/64, round 3).
                # rows2 x bq x keep swept on 1x v5e 2026-08-20
                # (demos/bench_2pass_tune.py, NQ=1e4): these defaults
                # are the best CLEAN configs in all four classes —
                # kernel-level m8 k=1000 112k qps (flags 1), m8 k=100
                # 147k (flags 16), m16 k=1000 103k (flags 3), m16
                # k=100 118k (flags 5). keep=2 at k=1000 runs 119-132k
                # but flags ~46% of queries (per-tile top-2*128 can't
                # hold 1000); rows2=64 collapses (27k — pass-2 windows
                # exceed VREGs); bq swings are noise-level (<5%).
                rows2 = 16 if kseg <= 512 else 32
                r2p = r if r_explicit else rows2       # r+rows2 pow2
                keep_tp = (keep if keep_explicit and keep
                           else (2 if kseg <= 512 else 4))
                return pallas_scan_codes_decode_topk_2p(
                    Qv, Cfv, nrmv, packed_seg, k=kseg, pq=index.pq,
                    r=r2p, bq=bq, tile=tile, keep=keep_tp,
                    keep2=0, rows2=rows2, verify=True,
                    interpret=interpret, op_dtype=lut_dtype,
                    vmem_mb=vmem_mb or 64)
            return pallas_scan_codes_decode_topk(
                Qv, Cfv, nrmv, packed_seg, k=kseg, pq=index.pq, r=r,
                bq=bq, tile=tile, keep=keep if keep else 0,
                verify=True, interpret=interpret, op_dtype=lut_dtype,
                stage=stage, vmem_mb=vmem_mb, qsuper=qsuper)

        def scan_segment(packed_seg, kseg):
            return scan_segment_with(Qj, Cf, nrm, packed_seg, kseg)

        def lut_rescan(qsel, starts, kfor):
            """Exact XLA LUT oracle over the listed segments for the
            selected queries (the rare flagged path)."""
            Tf = build_luts(index.C, Qj[qsel], pq=index.pq, d=d,
                            norms_cbook=index.norms_cbook)
            bs = bi = None
            for start, stop in starts:
                s2, i2 = xla_lut_scan(
                    Tf, unpack_codes(index.packed[start:stop],
                                     index.mprime),
                    kfor(start, stop), lut_dtype=lut_dtype)
                i2 = i2 + start
                if bs is None:
                    bs, bi = s2, i2
                else:
                    cs = jnp.concatenate([bs, s2], axis=1)
                    ci = jnp.concatenate([bi, i2], axis=1)
                    neg, loc = lax.top_k(-cs, min(k, cs.shape[1]))
                    bs = -neg
                    bi = jnp.take_along_axis(ci, loc, axis=1)
            return bs, bi

        if index.n <= seg and not interpret:
            # ONE fused dispatch (q2 folded in-graph) + ONE flag sync;
            # results stay ON DEVICE (an early version pulled the full
            # (nq, k) arrays through the axon tunnel per call: 13x
            # slower e2e; an eager q2/score-add chain cost another
            # 2.2-2.4x — demos/bench_codes_e2e_gap.py)
            if twopass:
                rows2 = 16 if k <= 512 else 32
                sq, i, fl, hard = _scan_segment_fused(
                    Qj, Cf, nrm, index.packed, k=k, pq=index.pq,
                    r=r if r_explicit else rows2, bq=bq, tile=tile,
                    keep=(keep if keep_explicit and keep
                          else (2 if k <= 512 else 4)),
                    rows2=rows2, twopass=True, qsuper=1, stage=0,
                    op_dtype=lut_dtype, vmem_mb=vmem_mb or 64)
            else:
                sq, i, fl, hard = _scan_segment_fused(
                    Qj, Cf, nrm, index.packed, k=k, pq=index.pq,
                    r=r, bq=bq, tile=tile, keep=keep if keep else 0,
                    rows2=0, twopass=False, qsuper=qsuper,
                    stage=stage, op_dtype=lut_dtype, vmem_mb=vmem_mb)
            fl = np.asarray(fl)
            if fl.any():
                # rescue merges q2-less per-segment lists; unflagged
                # rows may wobble 1 ulp from the (sq-q2)+q2 round trip
                # (scores are op_dtype-truncated anyway)
                hard = np.asarray(hard)
                q2 = q2f()
                s = sq - q2
                soft = fl & ~hard
                if soft.any():
                    # slot-overflow queries: the deep rescue kernel
                    # has not seen them yet — run it host-side
                    s, i = _rescue_segments(
                        Qj, Cf, nrm, index, s, i, soft[None],
                        [(0, index.n)], min(k, index.n),
                        lut_dtype=lut_dtype, interpret=interpret,
                        lut_rescan=lut_rescan)
                if hard.any():
                    # rescue-kernel-flagged queries: the same config
                    # would deterministically flag again — straight to
                    # the XLA LUT oracle (ADVICE r3)
                    qidx = np.nonzero(hard)[0]
                    s2, i2 = lut_rescan(qidx, [(0, index.n)],
                                        lambda a, b: min(k, b - a))
                    s = s.at[qidx].set(s2)
                    i = i.at[qidx].set(i2)
                return s + q2, i
            return sq, i
        if index.n <= seg:
            s, i, fl = scan_segment(index.packed, k)
            fl = np.asarray(fl)
            if fl.any():
                s, i = _rescue_segments(
                    Qj, Cf, nrm, index, s, i, fl[None],
                    [(0, index.n)], min(k, index.n),
                    lut_dtype=lut_dtype, interpret=interpret,
                    lut_rescan=lut_rescan)
            return s + q2f(), i

        # Segmented path: flag checks are DEFERRED so there is exactly
        # ONE host sync per call, not one per segment (120 segments x
        # ~50 ms axon round-trip was ~20% of a 1e9-code call).
        bounds = [(st, min(st + seg, index.n))
                  for st in range(0, index.n, seg)]
        nfull = index.n // seg
        rem = index.n - nfull * seg
        nq = Qj.shape[0]

        def _run_segments(Qv, Cfv, nrmv, packedv):
            """The whole multi-segment scan + exact merge as ONE
            traceable function of its device operands, so it can be
            jitted and CACHED per (index, config): built eagerly, the
            lax.scan graph re-traced and re-lowered on EVERY call —
            a jax.profiler trace of a warm 1e8 call showed ~0.7-1.0 s
            of pure host tracing/lowering against ~0.8 s of device
            time (round 4)."""
            if nfull >= 2 and k <= seg:
                # lax.scan over the equal-size segments: ONE dispatch
                # for all full segments instead of a host loop (120
                # segment launches at n=1e9 cost ~6 s in dispatch +
                # slice copies); the ragged remainder is one extra
                # call. The scan carries only SEGMENT INDICES and
                # dynamic-slices each segment out of the resident
                # array in-body: a reshaped (nfull, seg, w) xs operand
                # materialized a full second copy of the packed base —
                # fatal at n=1e9, where the base alone is 8 GB of the
                # 16 GB chip (caught by the round-4 on-device 1b run).
                wpk = packedv.shape[1]

                def body(carry, segi):
                    bs, bi = carry
                    pseg = lax.dynamic_slice(
                        packedv, (segi * seg, 0), (seg, wpk))
                    s, i, fl = scan_segment_with(Qv, Cfv, nrmv, pseg, k)
                    i = i + segi * seg
                    cs = jnp.concatenate([bs, s], axis=1)
                    ci = jnp.concatenate([bi, i], axis=1)
                    neg, loc = lax.top_k(-cs, k)   # (nq, 2k) merge
                    return ((-neg,
                             jnp.take_along_axis(ci, loc, axis=1)),
                            fl)

                init = (jnp.full((nq, k), jnp.inf, jnp.float32),
                        jnp.zeros((nq, k), jnp.int32))
                (bs, bi), fls = lax.scan(body, init, jnp.arange(nfull))
                if rem:
                    s, i, fl = scan_segment_with(
                        Qv, Cfv, nrmv, packedv[nfull * seg:],
                        min(k, rem))
                    cs = jnp.concatenate([bs, s], axis=1)
                    ci = jnp.concatenate([bi, i + nfull * seg], axis=1)
                    neg, loc = lax.top_k(-cs, k)
                    bs = -neg
                    bi = jnp.take_along_axis(ci, loc, axis=1)
                    fls = jnp.concatenate([fls, fl[None]], axis=0)
                return bs, bi, fls
            bs = bi = None
            fls = []
            for start, stop in bounds:
                s, i, fl = scan_segment_with(
                    Qv, Cfv, nrmv, packedv[start:stop],
                    min(k, stop - start))
                fls.append(fl)
                i = i + start
                if bs is None:
                    bs, bi = s, i
                else:
                    cat_s = jnp.concatenate([bs, s], axis=1)
                    cat_i = jnp.concatenate([bi, i], axis=1)
                    neg, loc = lax.top_k(-cat_s, k)  # (nq,<=2k) merge
                    bs = -neg
                    bi = jnp.take_along_axis(cat_i, loc, axis=1)
            return bs, bi, jnp.stack(fls)

        if interpret:
            run = _run_segments
        else:
            ckey = (Qj.shape, Qj.dtype.name, k,
                    jnp.dtype(lut_dtype).name, twopass, r, bq, tile,
                    keep, stage, qsuper, vmem_mb, r_explicit,
                    keep_explicit)
            run = index._seg_fns.get(ckey)
            if run is None:
                run = jax.jit(_run_segments)
                index._seg_fns[ckey] = run
        best_s, best_i, fls = run(Qj, Cf, nrm, index.packed)
        fl_seg = np.asarray(fls)                # ONE host sync
        if fl_seg.any():
            # the certificate is per (query, segment): repair only the
            # flagged segments with the deep exact kernel, not an XLA
            # scan over the whole base
            best_s, best_i = _rescue_segments(
                Qj, Cf, nrm, index, best_s, best_i, fl_seg, bounds, k,
                lut_dtype=lut_dtype, interpret=interpret,
                lut_rescan=lut_rescan)
        return best_s + q2f(), best_i
    elif not interpret:
        nc = (index.norms_cbook if index.norms_cbook is not None
              else jnp.zeros((0,), jnp.float32))
        sq, ids, flagged = _scan_lut_fused(
            jnp.asarray(Q), index.C, nc, index.packed, k=k, pq=index.pq,
            d=d, r=r, bq=bq, tile=tile, keep=keep, pack=pack,
            lut_dtype=lut_dtype, has_norms=index.norms_cbook is not None)
        flagged = np.asarray(flagged)
        if flagged.any():
            q2 = jnp.sum(jnp.asarray(Q) ** 2, axis=-1, keepdims=True)
            qidx = np.nonzero(flagged)[0]
            Tf = build_luts(index.C, jnp.asarray(Q)[qidx], pq=index.pq,
                            d=d, norms_cbook=index.norms_cbook)
            s2, i2 = xla_lut_scan(
                Tf, unpack_codes(index.packed, index.mprime),
                min(k, index.n), lut_dtype=lut_dtype)
            sq = sq.at[qidx].set(s2 + q2[qidx])
            ids = ids.at[qidx].set(i2)
        return sq, ids
    else:
        T = build_luts(index.C, Q, pq=index.pq, d=d,
                       norms_cbook=index.norms_cbook)
        scores, ids, flagged = pallas_scan_codes_topk(
            T, index.packed, k=k, r=r, bq=bq, tile=tile, verify=True,
            interpret=interpret, lut_dtype=lut_dtype, pack=pack,
            keep=keep)
    flagged = np.asarray(flagged)
    if flagged.any():
        qidx = np.nonzero(flagged)[0]
        Tf = build_luts(index.C, jnp.asarray(Q)[qidx], pq=index.pq,
                        d=d, norms_cbook=index.norms_cbook)
        s2, i2 = xla_lut_scan(Tf,
                              unpack_codes(index.packed, index.mprime),
                              min(k, index.n), lut_dtype=lut_dtype)
        scores = scores.at[qidx].set(s2)
        ids = ids.at[qidx].set(i2)
    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)
    return scores + q2, ids


def search_codes_streamed(C, B_packed, Q, k: int, *,
                          pq: bool = False, d: int | None = None,
                          norms_cbook=None, mprime: int | None = None,
                          shard_n: int = 100_000_000,
                          interpret: bool = False,
                          **kw) -> tuple[Array, Array]:
    """Code-resident search over a base too large for HBM: packed
    codes stay in HOST memory (a numpy array or an ``np.memmap`` over
    an on-disk code file) and stream to the chip shard by shard; each
    shard runs the full exact-unless-flagged `search_codes` pipeline
    on a shard-local `CodesIndex` and the per-shard top-k lists merge
    exactly on host.

    The beyond-HBM rung of the memory-tiling ladder (reference
    ``nsplits``, `src/LSQ_GPU.jl:218-264`): one chip already holds 1e9
    codes resident (8 GB at m=8); this extends to bases bounded only
    by host RAM/disk at the cost of host->device bandwidth per query
    batch. Equal shard shapes reuse one compiled executable (the
    shard-local index caches its jitted segmented graph per config).

    ``B_packed``: ``(n, ceil(m'/4)) int32`` in `pack_codes` layout
    (norms byte included for additive methods — pass ``mprime``).
    """
    B_packed = np.asarray(B_packed) if not isinstance(B_packed, np.memmap) \
        else B_packed
    n, nw = B_packed.shape
    mp = nw * 4 if mprime is None else mprime
    Cj = jnp.asarray(C)
    Qj = jnp.asarray(Q)
    d = Qj.shape[1] if d is None else d
    best_s = best_i = None
    # one CodesIndex per shard SHAPE, with the packed buffer swapped in
    # per shard: the per-instance _seg_fns trace cache survives across
    # equal-shape shards (a fresh index per shard paid the ~0.7-1.0 s
    # trace/lower cost once per shard — ADVICE r4); replacing .packed
    # also releases the previous shard's device buffer.
    # The NEXT shard's host->device transfer is issued BEFORE the
    # current shard's scan (jax.device_put is async), so transfer
    # overlaps compute — the streamed path is transfer-bound, and
    # serialized put->scan->put left the DMA link idle during every
    # scan. Peak device memory: 2 shards resident (current + inflight).
    idx_by_shape: dict = {}
    nc = None if norms_cbook is None else jnp.asarray(norms_cbook)
    bounds = [(st, min(st + shard_n, n))
              for st in range(0, n, shard_n)]

    def put(j):
        a, b = bounds[j]
        return jax.device_put(np.ascontiguousarray(B_packed[a:b]))

    pk_next = put(0)
    for j, (start, stop) in enumerate(bounds):
        pk = pk_next
        if j + 1 < len(bounds):
            pk_next = put(j + 1)           # async prefetch
        idx = idx_by_shape.get(pk.shape)
        if idx is None:
            idx = CodesIndex(pk, mp, Cj, pq=pq, d=d, norms_cbook=nc)
            idx_by_shape[pk.shape] = idx
        else:
            idx.packed = pk
            idx._lut_subs.clear()   # held slices of the old buffer
        s, i = search_codes(idx, Qj, min(k, stop - start),
                            interpret=interpret, **kw)
        s, i = np.asarray(s), np.asarray(i) + start
        del pk
        if best_s is None:
            best_s, best_i = s, i
        else:
            cat_s = np.concatenate([best_s, s], axis=1)
            cat_i = np.concatenate([best_i, i], axis=1)
            order = np.argsort(cat_s, axis=1, kind="stable")[:, :k]
            best_s = np.take_along_axis(cat_s, order, axis=1)
            best_i = np.take_along_axis(cat_i, order, axis=1)
    return jnp.asarray(best_s), jnp.asarray(best_i)
