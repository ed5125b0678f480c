"""Pallas fused ADC-scan + top-k kernel — the speed-of-light query path.

TPU-native replacement for the reference's OpenMP LUT scan
(`deps/src/linscan_aqd.cpp:37-102`,
`deps/src/linscan_aqd_pairwise_byte.cpp:14-176`). Two design decisions
set it apart from both the reference and the pure-XLA fallback
(`rayuela_tpu.search.linscan.scan_topk`):

1. **Scores come from the MXU, not table lookups.** The base set is
   decoded once to ``Xd (n, d)`` (+ per-row ``|x|^2``); each kernel
   step computes a (Bq, tile) block of squared distances as one
   ``dot_general`` — identical numbers to the reference's per-byte LUT
   accumulation, at matrix-unit throughput.

2. **Selection is a per-lane bitonic top-R, fused into the scan.**
   `lax.top_k` costs ~100x the matmul on TPU (measured); instead each
   query keeps a VMEM-resident running buffer of the best R values *per
   vector lane* (position mod 128), maintained by static bitonic
   sort/merge networks on the VPU — which overlaps with the next tile's
   MXU matmul. The scan emits (Bq, R, 128) candidates; the true top-k
   is inside them unless some lane held more than R of it (or, with
   ``keep`` pre-reduction, some (lane, tile) held more than keep).
   Exactness is certified per query: the packed kernels accumulate the
   min over every key they discard or evict (one extra output row), so
   a query is flagged iff its best non-candidate beats its k-th
   candidate — precisely when the answer could be wrong; the f32 mode
   runs a separate counting kernel instead. Flagged queries re-run
   through the exact XLA path. The combined result is exact, always.

Scratch persists across the tile grid dimension (TPU grids execute
sequentially), which is what makes the running buffer possible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayuela_tpu.utils import cdiv

Array = jax.Array

LANES = 128

# keep∈{2,4} pre-reduction uses the cheaper tournament forms; module
# flag (not an API) so A/B sweeps can force the general bitonic path
# (toggle + jax.clear_caches() to retrace)
_TOURNAMENT = True

# staged flush merges the staging buffer's already-sorted keep-runs
# (skipping the k <= keep phases of the staging sort) instead of
# full-sorting it; same A/B-flag convention as _TOURNAMENT
_RUNMERGE = True

# in-graph premin rescue slot count: flagged queries beyond this many
# fall through to the XLA rescan (expected flags at premin=2, k=100,
# n=1e6: ~150 per 1e4 queries)
_PREMIN_NR = 256

# search() default for the qbias non-negative-score mode (|q|^2 added
# and clamped in-kernel so the sortable-key transform is a plain
# bitcast); same A/B-flag convention as _TOURNAMENT
_QBIAS_DEFAULT = False

# search() default for the score16 bf16-score mode (`_row_key16`):
# halves the VMEM traffic of the score block (the measured 67% kernel
# floor) at bf16 score resolution; same A/B-flag convention as
# _TOURNAMENT. OFF until the on-chip A/B lands (NEXT.md lever).
_SCORE16_DEFAULT = False


# ---------------------------------------------------------------------------
# Static bitonic networks (precomputed permutations + min-masks)
# ---------------------------------------------------------------------------

def _sort_stages(s: int) -> list[tuple[int, np.ndarray]]:
    """Full bitonic sort network for size ``s`` (power of two):
    list of ``(stride j, per-block ascending mask (s//(2j),))`` stages;
    ascending output. Expressed block-structured (partner = i ^ j with
    2j <= k, so a whole 2j-block shares one direction) so each stage is
    reshape + slice + select — no gathers, Mosaic-friendly."""
    stages = []
    k = 2
    while k <= s:
        j = k // 2
        while j >= 1:
            stages.append((j, k))
            j //= 2
        k *= 2
    return stages


def _merge_stages(s: int) -> list[tuple[int, np.ndarray]]:
    """Bitonic merge network (input: one bitonic sequence of size
    ``s``), ascending output — all blocks ascending."""
    stages, j = [], s // 2
    while j >= 1:
        stages.append((j, 0))       # k=0 → every block ascending
        j //= 2
    return stages


def _apply_network(v: Array, i: Array, stages,
                   descending: bool = False) -> tuple[Array, Array]:
    """Run compare-exchange stages along axis 0 of (S, 128, Bq) arrays.

    The sort axis is the LEADING (batch) axis on purpose: every reshape
    and slice below touches only axis 0, so the minor (sublane, lane)
    tiles are never re-laid-out — each stage is pure elementwise VPU
    work. ``descending`` inverts every stage direction (used to sort
    tile rows descending so buffer++tile is bitonic without a reverse,
    which Mosaic does not lower)."""
    s = v.shape[0]
    rest = v.shape[1:]
    for j, k in stages:
        nb = s // (2 * j)
        v4 = v.reshape(nb, 2, j, *rest)
        i4 = i.reshape(nb, 2, j, *rest)
        a, b = v4[:, 0], v4[:, 1]
        ia, ib = i4[:, 0], i4[:, 1]
        lo = a <= b
        vmin, vmax = jnp.where(lo, a, b), jnp.where(lo, b, a)
        imin, imax = jnp.where(lo, ia, ib), jnp.where(lo, ib, ia)
        if k == 0 or 2 * j * nb <= k:        # uniform direction
            if descending:
                first, second = vmax, vmin
                ifirst, isecond = imax, imin
            else:
                first, second, ifirst, isecond = vmin, vmax, imin, imax
        else:
            # block a spans indices [a*2j, (a+1)*2j); ascending iff
            # (a*2j) & k == 0 — derived on-chip, no captured constants
            blk = lax.broadcasted_iota(
                jnp.int32, (nb, 1) + (1,) * len(rest), 0)
            up = ((blk * (2 * j)) & k) == 0
            if descending:
                up = jnp.logical_not(up)
            first = jnp.where(up, vmin, vmax)
            second = jnp.where(up, vmax, vmin)
            ifirst = jnp.where(up, imin, imax)
            isecond = jnp.where(up, imax, imin)
        v = jnp.stack([first, second], axis=1).reshape(s, *rest)
        i = jnp.stack([ifirst, isecond], axis=1).reshape(s, *rest)
    return v, i


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _apply_network1(v: Array, stages, descending: bool = False) -> Array:
    """Single-array variant of `_apply_network` (packed keys carry the
    payload in their low bits, so there is no separate id array —
    one compare + two selects per stage instead of five ops)."""
    s = v.shape[0]
    rest = v.shape[1:]
    for j, k in stages:
        nb = s // (2 * j)
        v4 = v.reshape(nb, 2, j, *rest)
        a, b = v4[:, 0], v4[:, 1]
        vmin, vmax = jnp.minimum(a, b), jnp.maximum(a, b)
        if k == 0 or 2 * j * nb <= k:        # uniform direction
            first, second = (vmax, vmin) if descending else (vmin, vmax)
        else:
            blk = lax.broadcasted_iota(
                jnp.int32, (nb, 1) + (1,) * len(rest), 0)
            up = ((blk * (2 * j)) & k) == 0
            if descending:
                up = jnp.logical_not(up)
            first = jnp.where(up, vmin, vmax)
            second = jnp.where(up, vmax, vmin)
        v = jnp.stack([first, second], axis=1).reshape(s, *rest)
    return v


def _top2_tournament(kv: Array) -> tuple[Array, Array]:
    """Exact per-lane top-2 (smallest) of ``kv`` (s, LANES, bq),
    s >= 4, sorted DESCENDING, plus the min over all discarded keys
    (= the 3rd smallest) — the ``keep=2`` fast path of `_prered_topk`.

    A tournament over SORTED PAIRS: merging pairs (a1<=a2), (b1<=b2)
    gives m1 = min(a1,b1) and — the identity that makes this cheap —
    m2 = min(max(a1,b1), min(a2,b2)), with the two discards
    max(a2,b2) and max(max(a1,b1), min(a2,b2)). That is 7 vector
    min/max per FOUR elements per level (~4x fewer ops than the
    general discard-half bitonic stages, which pay direction masks and
    paired stack/reshape selects), all on the leading axis."""
    s = kv.shape[0]
    rest = kv.shape[1:]
    v4 = kv.reshape(s // 2, 2, *rest)
    a1 = jnp.minimum(v4[:, 0], v4[:, 1])
    a2 = jnp.maximum(v4[:, 0], v4[:, 1])
    disc = None
    while a1.shape[0] > 1:
        p = a1.shape[0] // 2
        A = a1.reshape(p, 2, *rest)
        B = a2.reshape(p, 2, *rest)
        x1, y1 = A[:, 0], A[:, 1]
        x2, y2 = B[:, 0], B[:, 1]
        t = jnp.maximum(x1, y1)
        u = jnp.minimum(x2, y2)
        dl = jnp.minimum(jnp.maximum(x2, y2), jnp.maximum(t, u))
        dm = jnp.min(dl, axis=0)
        disc = dm if disc is None else jnp.minimum(disc, dm)
        a1 = jnp.minimum(x1, y1)
        a2 = jnp.minimum(t, u)
    out = jnp.concatenate([a2, a1], axis=0)          # (2, ...) desc
    return out, disc


def _top4_tournament(kv: Array) -> tuple[Array, Array]:
    """Exact per-lane top-4 of ``kv`` (s, LANES, bq), s >= 8, sorted
    DESCENDING, plus the min over all discarded keys (= the 5th
    smallest) — the ``keep=4`` fast path of `_prered_topk`.

    A tournament over SORTED QUADS. Merging ascending quads A, B uses
    the bitonic half-clean property: comparing ``a_i`` with
    ``b_{5-i}`` (A ++ reverse(B) is bitonic, so one stride-4 exchange
    splits lowest-4 from highest-4, both halves bitonic); the lower
    half then sorts with one stride-2 + one stride-1 stage, and the
    upper half's min (3 mins — it is bitonic, not sorted) feeds the
    discard accumulator. ~19 min/max per EIGHT elements per level,
    vs 3 masked bitonic stages in the general discard-half path. The
    quads live as four separate (blocks, ...) arrays so every op is
    plain elementwise min/max — no direction masks, no stack/reshape
    interleaves except the block pairing."""
    s = kv.shape[0]
    rest = kv.shape[1:]
    Q4 = kv.reshape(s // 4, 4, *rest)
    q0, q1, q2, q3 = Q4[:, 0], Q4[:, 1], Q4[:, 2], Q4[:, 3]
    p1, P1 = jnp.minimum(q0, q1), jnp.maximum(q0, q1)
    p2, P2 = jnp.minimum(q2, q3), jnp.maximum(q2, q3)
    t, u = jnp.maximum(p1, p2), jnp.minimum(P1, P2)
    s1 = jnp.minimum(p1, p2)
    s2 = jnp.minimum(t, u)
    s3 = jnp.maximum(t, u)
    s4 = jnp.maximum(P1, P2)
    disc = None
    while s1.shape[0] > 1:
        p = s1.shape[0] // 2
        pair = [x.reshape(p, 2, *rest) for x in (s1, s2, s3, s4)]
        A = [x[:, 0] for x in pair]
        B = [x[:, 1] for x in pair]
        l1, u1 = jnp.minimum(A[0], B[3]), jnp.maximum(A[0], B[3])
        l2, u2 = jnp.minimum(A[1], B[2]), jnp.maximum(A[1], B[2])
        l3, u3 = jnp.minimum(A[2], B[1]), jnp.maximum(A[2], B[1])
        l4, u4 = jnp.minimum(A[3], B[0]), jnp.maximum(A[3], B[0])
        dl = jnp.minimum(jnp.minimum(u1, u2), jnp.minimum(u3, u4))
        dm = jnp.min(dl, axis=0)
        disc = dm if disc is None else jnp.minimum(disc, dm)
        e1, e3 = jnp.minimum(l1, l3), jnp.maximum(l1, l3)
        e2, e4 = jnp.minimum(l2, l4), jnp.maximum(l2, l4)
        s1, s2 = jnp.minimum(e1, e2), jnp.maximum(e1, e2)
        s3, s4 = jnp.minimum(e3, e4), jnp.maximum(e3, e4)
    out = jnp.concatenate([s4, s3, s2, s1], axis=0)  # (4, ...) desc
    return out, disc


def _prered_topk(kv: Array, keep: int) -> tuple[Array, Array | None]:
    """Per-lane top-``keep`` (smallest) keys of ``kv`` (s, LANES, bq),
    sorted DESCENDING, plus the MIN over all discarded keys (None if
    nothing was discarded) — a discard-half bitonic reduction.

    Phase 1 sorts each ``keep``-block with alternating directions
    (even blocks descending); phase 2 repeatedly bitonic-merges block
    pairs (desc++asc is bitonic) and keeps each merged pair's better
    half, halving the array until only the top-``keep`` remain. Total
    work is O(log^2 keep + log(s/keep)) stages — far below the full
    sort's O(log^2 s) when keep << s, which is what makes selection
    stop dominating the scan.

    The discard-min is the exactness certificate's input: an element
    smaller than the tile's (keep+1)-th smallest is never discarded
    (fewer than ``keep`` elements beat it), so the discard-min IS the
    tile's (keep+1)-th smallest, and min-ing it across tiles gives the
    best key the scan ever threw away before the buffer."""
    s = kv.shape[0]
    rest = kv.shape[1:]
    if s == keep:
        return (_apply_network1(kv, _sort_stages(s), descending=True),
                None)
    if keep == 2 and _TOURNAMENT:
        return _top2_tournament(kv)
    if keep == 4 and _TOURNAMENT:
        return _top4_tournament(kv)

    def stage(v, j, up_fn):
        nb = v.shape[0] // (2 * j)
        v4 = v.reshape(nb, 2, j, *rest)
        a, b = v4[:, 0], v4[:, 1]
        vmin, vmax = jnp.minimum(a, b), jnp.maximum(a, b)
        o = lax.broadcasted_iota(
            jnp.int32, (nb, 1) + (1,) * len(rest), 0) * (2 * j)
        up = up_fn(o)
        first = jnp.where(up, vmin, vmax)
        second = jnp.where(up, vmax, vmin)
        return jnp.stack([first, second], axis=1).reshape(-1, *rest)

    # phase 1: sort keep-blocks; block b descending iff b even
    K = 2
    while K <= keep:
        j = K // 2
        while j >= 1:
            def up_fn(o, K=K):
                asc_std = ((o % keep) & K) == 0
                b_even = ((o // keep) % 2) == 0
                return jnp.logical_xor(asc_std, b_even)
            kv = stage(kv, j, up_fn)
            j //= 2
        K *= 2

    # phase 2: merge 2keep-pairs (sorted desc iff pair even), discard
    disc_min = None
    while s > keep:
        j = keep
        while j >= 1:
            kv = stage(kv, j,
                       lambda o: ((o // (2 * keep)) % 2) == 1)
            j //= 2
        nc = s // (2 * keep)
        v4 = kv.reshape(nc, 2, keep, *rest)
        c_even = (lax.broadcasted_iota(
            jnp.int32, (nc, 1) + (1,) * len(rest), 0) % 2) == 0
        # desc block (even pair): its smallest ``keep`` is the 2nd
        # half; the discarded half is sorted too, so its min is one
        # known position (last of the desc half / first of the asc)
        kv_kept = jnp.where(c_even, v4[:, 1], v4[:, 0])
        dm = jnp.min(jnp.where(c_even[:, 0], v4[:, 0, keep - 1],
                               v4[:, 1, 0]), axis=0)
        disc_min = dm if disc_min is None else jnp.minimum(disc_min, dm)
        kv = kv_kept.reshape(-1, *rest)
        s //= 2
    return kv, disc_min


def _premin(kv: Array, premin: int) -> tuple[Array, Array | None]:
    """``premin`` pairwise-min halving stages on packed keys
    (s, LANES, bq) → (s >> premin, LANES, bq), plus the MIN over every
    discarded key (None when premin == 0).

    With pack32 keys a pairwise min is ONE vector op (the key carries
    its own row id — no payload swap), so this pre-filter costs ~1.5
    ops per input element vs ~10 for the cheapest bitonic stage chain,
    at the price of being LOSSY: a true top-k element is dropped iff a
    smaller element lands in its ``2^premin``-row window (same lane,
    same tile). Expected losses/query ≈ (2^premin − 1)·k²/(2n) —
    ~1.5% at k=100, n=1e6, premin=2 — and every loss is caught by the
    discard-min certificate, so flagged queries re-run exactly; the
    combined result stays exact. Only sane for k ≪ √n; `_auto_config`
    enables it for the small-k class only."""
    disc = None
    for _ in range(premin):
        s = kv.shape[0]
        v4 = kv.reshape(s // 2, 2, *kv.shape[1:])
        a, b = v4[:, 0], v4[:, 1]
        kv = jnp.minimum(a, b)
        dm = jnp.min(jnp.maximum(a, b), axis=0)
        disc = dm if disc is None else jnp.minimum(disc, dm)
    return kv, disc


def _sortable_key(s: Array) -> Array:
    """f32 → int32 whose SIGNED order equals the float order: flip the
    lower 31 bits of negatives (positives are their own key). Signed,
    not unsigned, on purpose — Mosaic has no ``arith.minui``/unsigned
    vector compares, but int32 min/max lower fine. Monotone, so
    truncating low bits (floor in signed space) is monotone too."""
    bits = lax.bitcast_convert_type(s, jnp.int32)
    return jnp.where(bits >= 0, bits, bits ^ jnp.int32(0x7FFFFFFF))


def _unsortable_key(k: Array) -> Array:
    """Inverse of `_sortable_key` (int32 keys → f32)."""
    bits = jnp.where(k >= 0, k, k ^ jnp.int32(0x7FFFFFFF))
    return lax.bitcast_convert_type(bits, jnp.float32)


def _decode_packed_vals(skeys: Array, idbits: int,
                        score16: bool) -> Array:
    """Packed selection keys → f32 scores (the truncation the kernel
    selected under stays). score16 keys hold sign-fixed bf16 bits at
    ``[16+idbits-1 : idbits]`` (`_row_key16`); f32 keys hold the
    sortable transform's top ``32-idbits`` bits."""
    if score16:
        v = (skeys >> idbits).astype(jnp.int16)
        v = jnp.where(v >= 0, v, v ^ jnp.int16(0x7FFF))
        return lax.bitcast_convert_type(v, jnp.bfloat16).astype(
            jnp.float32)
    return _unsortable_key(skeys & jnp.int32(-(1 << idbits)))


def _row_key16(s: Array, t, *, rows: int, bq: int, idbits: int) -> Array:
    """bf16-score packed key (the score16 mode — NEXT.md's "smaller
    score dtype end-to-end" floor lever): the score block arrives from
    the MXU as BF16 (half the VMEM bytes of the f32 block that is 67%
    of kernel time), the sortable-sign fix runs on i16 (half-width VPU
    pass), and only the final extend-shift-or materializes i32:

        key = sign_fixed_bf16_bits (16) << idbits | rid (idbits)

    Signed i32 order == (bf16 score, row id) lexicographic — total,
    tie-free. Needs ``16 + idbits <= 31`` (callers gate on
    idbits <= 15; SIFT1M tiles use 13). The selection chain, the
    certificate and the premin/tournament reductions are unchanged —
    they only ever see i32 keys."""
    sv = s.reshape(rows, LANES, bq)
    b16 = lax.bitcast_convert_type(sv, jnp.int16)
    # sign-fix AFTER widening: v5e Mosaic lowers the i16->i32 extension
    # but not i16 vector compares ("Target does not support this
    # comparison", measured 2026-08-20) — so only the bitcast and the
    # extension run at half width
    b32 = b16.astype(jnp.int32)
    k32 = jnp.where(b32 >= 0, b32, b32 ^ jnp.int32(0x7FFF))
    rid = (lax.broadcasted_iota(jnp.int32, (rows, LANES, 1), 0)
           + t * rows)
    return (k32 << idbits) | rid


def _row_key(s: Array, t, *, rows: int, bq: int, idbits: int,
             nonneg: bool = False) -> Array:
    """Packed selection key for a (tile, Bq) f32 score block: the top
    32-idbits bits of the sortable value, low ``idbits`` bits the
    per-lane row id (gid = rowid*128 + lane). Keys are UNIQUE per
    (lane, query), so the packed order is total — no ties anywhere in
    the selection or its certificate.

    The row id is LANE-INDEPENDENT (rid = gid >> 7 = t*rows + row), so
    it is one (rows, LANES, 1) iota broadcast-OR'd over the query
    minor axis — an earlier form materialized the full
    (rows, LANES, bq) gid with two iotas and shifted the lane bits
    away, which cost ~1.5 ms per 2048 queries at k=1000 (measured
    2026-08-19, /tmp/exp_sel2.log: +2.8% qps from this change alone;
    bit-identical outputs).

    ``nonneg`` asserts every score is >= +0.0 (the qbias mode: the
    kernel adds |q|^2 and clamps, so scores are true squared distances)
    — then the plain int32 bitcast IS the sortable key and the
    sign-fix select drops (NEXT.md lever (a): the last remaining
    key-side op)."""
    sv = s.reshape(rows, LANES, bq)
    rid = (lax.broadcasted_iota(jnp.int32, (rows, LANES, 1), 0)
           + t * rows)
    key = (lax.bitcast_convert_type(sv, jnp.int32) if nonneg
           else _sortable_key(sv))
    vmask = jnp.int32(-(1 << idbits))                 # low idbits zero
    return (key & vmask) | rid


def _select_insert_packed(s: Array, t, bufp, dminp, sem, outp_ref,
                          *, rows: int, r: int, ntiles: int, bq: int,
                          idbits: int, keep: int = 0, qstart=None,
                          premin: int = 0, nonneg: bool = False,
                          score16: bool = False):
    """pack32 selection tail: bitonic-sort the tile rows' packed keys
    descending, merge into the per-lane running top-R key buffer, DMA
    it to HBM on the last tile.

    Each element is ONE int32 key — signed-sortable score top bits |
    per-lane row id low bits. Signed order == (truncated score, row id)
    lexicographic, a TOTAL order with no ties; one compare + two
    selects per network stage instead of five ops, at half the bytes.
    The verification count compares in the same packed space, so
    exactness (for the truncated-score ranking) is certified
    identically. Hosts reconstruct ``gid = rowid*128 + lane``.

    ``keep`` > 0 pre-reduces each tile to its per-lane top-``keep``
    (`_prered_topk`) before the buffer merge — ~2-3x less selection
    work; exact unless some (lane, tile) holds more than ``keep`` of
    the top-k.

    The kernel also emits an EXACT exactness certificate, so no second
    counting pass is needed (see `pallas_scan_topk`): ``dminp`` tracks
    the running min over every key the scan ever threw away — prered
    discard-mins plus the min evicted from each buffer merge
    (``mv[r]``). Every non-candidate element was discarded or evicted
    exactly once, so dminp < tau  <=>  the candidate buffer misses
    some below-tau element  <=>  the returned top-k could be wrong."""
    @pl.when(t == 0)
    def _():
        bufp[:] = jnp.full(bufp.shape, jnp.iinfo(jnp.int32).max,
                           jnp.int32)
        dminp[:] = jnp.full(dminp.shape, jnp.iinfo(jnp.int32).max,
                            jnp.int32)

    kv = (_row_key16(s, t, rows=rows, bq=bq, idbits=idbits) if score16
          else _row_key(s, t, rows=rows, bq=bq, idbits=idbits,
                        nonneg=nonneg))
    if premin:
        kv, pm_min = _premin(kv, premin)
        dminp[:] = jnp.minimum(dminp[:], pm_min[None])
        rows = rows >> premin
    if keep and keep < rows:
        kv, disc_min = _prered_topk(kv, keep)
        if disc_min is not None:
            dminp[:] = jnp.minimum(dminp[:], disc_min[None])
        mv = jnp.concatenate([bufp[:], kv], axis=0)
        mv = _apply_network1(mv, _merge_stages(r + keep))
    else:
        kv = _apply_network1(kv, _sort_stages(rows), descending=True)
        mv = jnp.concatenate([bufp[:], kv], axis=0)
        mv = _apply_network1(mv, _merge_stages(r + rows))
    bufp[:] = mv[:r]
    dminp[:] = jnp.minimum(dminp[:], mv[r:r + 1])   # min evicted key

    q0 = pl.program_id(0) * bq if qstart is None else qstart

    @pl.when(t == ntiles - 1)
    def _():
        cp = pltpu.make_async_copy(
            bufp, outp_ref.at[:r, :, pl.ds(q0, bq)], sem.at[0])
        cpd = pltpu.make_async_copy(
            dminp, outp_ref.at[r:, :, pl.ds(q0, bq)], sem.at[1])
        cp.start()
        cpd.start()
        cp.wait()
        cpd.wait()


def _select_insert_packed_staged(s: Array, t, bufp, stagep, dminp, sem,
                                 outp_ref, *, rows: int, r: int,
                                 ntiles: int, bq: int, idbits: int,
                                 keep: int, stage: int,
                                 premin: int = 0, nonneg: bool = False,
                                 score16: bool = False):
    """Staged variant of `_select_insert_packed`: each tile still
    pre-reduces EXACTLY to its per-lane top-``keep`` (so the flag rate
    is unchanged), but the reduced keys go to a staging buffer and the
    expensive ``(r + keep·stage)``-wide buffer merge runs once every
    ``stage`` tiles instead of every tile — the per-tile merge was
    ~5 compare-exchange stages over r+keep rows, comparable to the
    pre-reduction itself (measured: selection ≈ 46% of the kernel at
    k=1000). The certificate is identical: per-tile discard-mins
    accumulate as before, and evictions only ever happen in the
    periodic merge, whose min-evicted row is tracked the same way."""
    imax = jnp.iinfo(jnp.int32).max

    @pl.when(t == 0)
    def _():
        bufp[:] = jnp.full(bufp.shape, imax, jnp.int32)
        dminp[:] = jnp.full(dminp.shape, imax, jnp.int32)

    @pl.when(lax.rem(t, stage) == 0)
    def _():
        stagep[:] = jnp.full(stagep.shape, imax, jnp.int32)

    kv = (_row_key16(s, t, rows=rows, bq=bq, idbits=idbits) if score16
          else _row_key(s, t, rows=rows, bq=bq, idbits=idbits,
                        nonneg=nonneg))
    if premin:
        kv, pm_min = _premin(kv, premin)
        dminp[:] = jnp.minimum(dminp[:], pm_min[None])
        rows = rows >> premin
    kv, disc_min = _prered_topk(kv, keep)
    if disc_min is not None:
        dminp[:] = jnp.minimum(dminp[:], disc_min[None])
    sidx = lax.rem(t, stage)
    if _RUNMERGE and keep > 1:
        # store runs in ALTERNATING directions (even slot descending —
        # prered's natural order — odd slot reversed to ascending):
        # exactly the state a descending-target bitonic sort of
        # keep*stage rows is in after completing its width-``keep``
        # phase, so the flush below resumes that network at width
        # 2*keep instead of full-sorting from scratch. Reversing
        # ``keep`` rows costs log2(keep) stack stages on a tiny array;
        # the flush saves log2(keep)*(log2(keep)+1)/2 full-width
        # stages every ``stage`` tiles. Empty slots stay imax
        # (constant runs sort both ways).
        kv = jnp.where(sidx % 2 == 0, kv, _rev_leading(kv))
    stagep[pl.ds(sidx * keep, keep)] = kv

    @pl.when((sidx == stage - 1) | (t == ntiles - 1))
    def _():
        if _RUNMERGE and keep > 1:
            tail_stages = [(j, kk) for (j, kk)
                           in _sort_stages(keep * stage) if kk > keep]
            sv = _apply_network1(stagep[:], tail_stages,
                                 descending=True)
        else:
            # full sort of the staging rows — the simple, safe form
            sv = _apply_network1(stagep[:], _sort_stages(keep * stage),
                                 descending=True)
        mv = jnp.concatenate([bufp[:], sv], axis=0)
        mv = _apply_network1(mv, _merge_stages(r + keep * stage))
        bufp[:] = mv[:r]
        dminp[:] = jnp.minimum(dminp[:], mv[r:r + 1])

    qb = pl.program_id(0)

    @pl.when(t == ntiles - 1)
    def _():
        cp = pltpu.make_async_copy(
            bufp, outp_ref.at[:r, :, pl.ds(qb * bq, bq)], sem.at[0])
        cpd = pltpu.make_async_copy(
            dminp, outp_ref.at[r:, :, pl.ds(qb * bq, bq)], sem.at[1])
        cp.start()
        cpd.start()
        cp.wait()
        cpd.wait()


def _distance_block(qt_ref, x_ref, x2_ref, q2_ref=None,
                    out16: bool = False):
    """(tile, Bq) squared distances, up to the per-query |q|^2 term.

    With ``q2_ref`` ((1, bq) per-query |q|^2), the |q|^2 term IS added
    and the result clamped at +0.0: true squared distances are
    non-negative, but the f32 sum can round a near-zero distance
    negative — the clamp maps those to exactly 0.0 (they are genuine
    "query equals its reconstruction" hits; the packed rid tie-break
    keeps the order total). Non-negative scores make the plain int32
    bitcast order-preserving (`_row_key(nonneg=True)`).

    ``out16``: emit the block as BF16 (f32 MXU accumulation, bf16
    epilogue) — the score16 floor-reduction mode (`_row_key16`)."""
    s = -2.0 * lax.dot_general(
        x_ref[:], qt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + x2_ref[:]
    if q2_ref is not None:
        s = jnp.maximum(s + q2_ref[:], 0.0)
    return s.astype(jnp.bfloat16) if out16 else s


def _scan_kernel(qt_ref, x_ref, x2_ref, outv_ref, outi_ref,
                 bufv, bufi, sem, *, rows: int, r: int, ntiles: int,
                 bq: int):
    """One (query-block, tile) step: MXU distance block + bitonic
    insert into the per-lane running top-R buffer (f32 + i32 global
    ids — the exact-float-order mode, kept VERBATIM from round 1: the
    shared-helper refactor of this body compiled to a 17.8 MB scoped
    VMEM footprint at r=48 vs 16 MB for this form, for no discernible
    semantic difference; packed mode lives in `_select_insert_packed`).

    Layout: everything selection-related is (slots, 128 lanes, Bq) so
    the sort axis is the leading batch axis (see `_apply_network`)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        bufv[:] = jnp.full(bufv.shape, jnp.inf, jnp.float32)
        bufi[:] = jnp.zeros(bufi.shape, jnp.int32)

    s = _distance_block(qt_ref, x_ref, x2_ref)
    tile, bq = s.shape
    sv = s.reshape(rows, LANES, bq)
    gid = (t * tile
           + lax.broadcasted_iota(jnp.int32, (rows, LANES, bq), 0) * LANES
           + lax.broadcasted_iota(jnp.int32, (rows, LANES, bq), 1))

    sv, si = _apply_network(sv, gid, _sort_stages(rows), descending=True)

    # buffer (R asc) ++ tile rows sorted desc = bitonic sequence
    mv = jnp.concatenate([bufv[:], sv], axis=0)
    mi = jnp.concatenate([bufi[:], si], axis=0)
    mv, mi = _apply_network(mv, mi, _merge_stages(r + rows))
    bufv[:] = mv[:r]
    bufi[:] = mi[:r]

    # Outputs live in HBM (pl.ANY): DMA the final buffers out directly.
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


def _scan_kernel_packed(qt_ref, x_ref, x2_ref, *rest, rows: int, r: int,
                        ntiles: int, bq: int, idbits: int,
                        keep: int = 0, premin: int = 0,
                        qbias: bool = False, score16: bool = False):
    """pack32 variant: one int32 (value|rowid) key per element.

    ``qbias``: a fourth input ref carries per-query |q|^2; scores are
    biased non-negative in-kernel so the key transform is a plain
    bitcast (see `_distance_block`/`_row_key`). ``score16``: bf16
    score block + 16-bit key formation (`_row_key16`)."""
    t = pl.program_id(1)
    if qbias:
        q2_ref, outp_ref, bufp, dminp, sem = rest
    else:
        (outp_ref, bufp, dminp, sem), q2_ref = rest, None
    s = _distance_block(qt_ref, x_ref, x2_ref, q2_ref, out16=score16)
    _select_insert_packed(s, t, bufp, dminp, sem, outp_ref, rows=rows,
                          r=r, ntiles=ntiles, bq=bq, idbits=idbits,
                          keep=keep, premin=premin, nonneg=qbias,
                          score16=score16)


def _scan_kernel_packed_staged(qt_ref, x_ref, x2_ref, *rest, rows: int,
                               r: int, ntiles: int, bq: int, idbits: int,
                               keep: int, stage: int, premin: int = 0,
                               qbias: bool = False, score16: bool = False):
    """pack32 + staged buffer merge (see `_select_insert_packed_staged`)."""
    t = pl.program_id(1)
    if qbias:
        q2_ref, outp_ref, bufp, stagep, dminp, sem = rest
    else:
        (outp_ref, bufp, stagep, dminp, sem), q2_ref = rest, None
    s = _distance_block(qt_ref, x_ref, x2_ref, q2_ref, out16=score16)
    _select_insert_packed_staged(s, t, bufp, stagep, dminp, sem,
                                 outp_ref, rows=rows, r=r,
                                 ntiles=ntiles, bq=bq, idbits=idbits,
                                 keep=keep, stage=stage, premin=premin,
                                 nonneg=qbias, score16=score16)


def _count_below(s: Array, t, tau_ref, *, rows: int, bq: int,
                 idbits: int) -> Array:
    """(LANES, Bq) count of elements strictly below tau, compared in
    the same space the scan kernel selected in: raw f32 scores
    (idbits=0) or packed uint32 keys (pack32 mode — the packed order
    is total, so the certificate has no tie cases at all)."""
    if idbits:
        kv = _row_key(s, t, rows=rows, bq=bq, idbits=idbits)
        hit = (kv < tau_ref[:][None, :, :]).astype(jnp.int32)
    else:
        sv = s.reshape(rows, LANES, bq)
        hit = (sv < tau_ref[:][None, :, :]).astype(jnp.int32)
    return jnp.sum(hit, axis=0)


def _verify_kernel(qt_ref, x_ref, x2_ref, tau_ref, cnt_ref, acc, accm,
                   *, rows: int, ntiles: int, idbits: int):
    """Count, per (query, lane), scores strictly below the global k-th
    selection key tau: the running total (exactness needs <= r per
    lane) AND the per-tile maximum (pre-reduction exactness needs
    <= keep per (lane, tile)). ``cnt_ref`` row 0 is the total, row 1
    the max-over-tiles."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros(acc.shape, jnp.int32)
        accm[:] = jnp.zeros(accm.shape, jnp.int32)

    s = _distance_block(qt_ref, x_ref, x2_ref)
    c = _count_below(s, t, tau_ref, rows=rows, bq=s.shape[1],
                     idbits=idbits)
    acc[:] = acc[:] + c
    accm[:] = jnp.maximum(accm[:], c)

    @pl.when(t == ntiles - 1)
    def _():
        cnt_ref[0] = acc[:]
        cnt_ref[1] = accm[:]


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

def _pad2(x, r0, r1, fill=0.0):
    p0, p1 = r0 - x.shape[0], r1 - x.shape[1]
    if p0 == 0 and p1 == 0:
        return x
    return jnp.pad(x, ((0, p0), (0, p1)), constant_values=fill)


def _pack_idbits(pack: bool, npad: int) -> int:
    """Packed-mode row-id width (0 = packed mode off). Row ids span
    npad/128 values; cap at 16 bits (n <= 8.4M — beyond that the
    truncated value bits get too coarse; shard or stream instead)."""
    if not pack:
        return 0
    rowmax = npad // LANES
    idbits = max(1, (rowmax - 1).bit_length())
    return idbits if idbits <= 16 else 0


def _rev_leading(x: Array) -> Array:
    """Reverse a power-of-two leading axis by recursive half-swaps
    (log2 stages of reshape + stack) — Mosaic does not lower ``rev``,
    and every op here touches only the leading axis."""
    s = x.shape[0]
    rest = x.shape[1:]
    j = s // 2
    while j >= 1:
        x4 = x.reshape(s // (2 * j), 2, j, *rest)
        x = jnp.stack([x4[:, 1], x4[:, 0]], axis=1).reshape(s, *rest)
        j //= 2
    return x


def _tail_kernel(outp_ref, keys_ref, lanes_ref, *, r: int, L0: int,
                 cap: int, bq2: int):
    """Cross-lane top-``cap`` merge of the scan's per-lane key buffers,
    entirely in VMEM — the Pallas replacement for the host-side
    `_packed_candidates` selection, which measured 199 ms (lax.top_k)
    / 193 ms (XLA merge tree, unfused) at k=1000 vs the 139 ms scan
    kernel itself (1x v5e, r=28, nq=1e4).

    Input block: (r, LANES, bq2) packed keys, each lane's list sorted
    ascending; the lane id rides along as an explicit payload (the
    packed key's low bits hold only the per-lane row id;
    gid = rowid * 128 + lane). A bitonic merge tree halves the list
    count per round; lists beyond ``cap`` ranks are dropped with one
    stride-``cap`` compare per round (exact: the lower half of a
    bitonic 2*cap sequence after that stage IS its smallest ``cap``).

    Two phases keep every array at full (8, 128) vreg occupancy — a
    naive (slots, lists, bq2) tree OOMs scoped VMEM once the lists
    axis decays below 8 sublanes (measured 19.3 MB vs the 16 MB limit
    at k=1000):

    * Phase A (128 → 8 lists): state (slots, c, bq2), c >= 8 on the
      sublane axis. No reversals after round 0: lists carry
      ALTERNATING sort directions (pair halves asc ++ desc = bitonic
      directly), and each round's merge network runs per-list
      directions via a sublane-iota mask. Round 0 reverses the upper
      64 lanes once (`_rev_leading`, leading-axis half-swaps — Mosaic
      has no ``rev``).

    * Phase B (8 -> 1): state stays (L8, 8, bq2); each list occupies a
      contiguous block of sublane COLUMNS (rank-major: rank = col*L8
      + slot). Compare-exchanges at rank-stride >= L8 become sublane
      rotations (`pltpu.roll`) at a uniform per-stage column distance;
      strides < L8 are ordinary leading-axis stages. Adjacent-pair
      pairing + even-asc directions keep every roll distance uniform.
    """
    imax = jnp.iinfo(jnp.int32).max
    K = outp_ref[...]                                 # (r, LANES, bq2)
    if r > L0:
        # per-lane rank >= L0 >= cap -> never in the global top-cap
        K = K[:L0]
    elif L0 > r:
        K = jnp.concatenate(
            [K, jnp.full((L0 - r, LANES, bq2), imax, jnp.int32)],
            axis=0)
    P = lax.broadcasted_iota(jnp.int32, (L0, LANES, bq2), 1)

    # round 0 direction fix: upper half of the lanes descending
    desc = lax.broadcasted_iota(
        jnp.int32, (1, LANES, bq2), 1) >= LANES // 2
    K = jnp.where(desc, _rev_leading(K), K)
    P = jnp.where(desc, _rev_leading(P), P)

    # ---- phase A: (slots, c, bq2), c: 128 -> 8 ----
    L, c = L0, LANES
    while c > 8:
        c2 = c // 2
        # lists j < c2 asc, j >= c2 desc (invariant) -> concat bitonic
        V = jnp.concatenate([K[:, :c2], K[:, c2:]], axis=0)
        PV = jnp.concatenate([P[:, :c2], P[:, c2:]], axis=0)
        S = 2 * L
        if S > cap:
            assert L == cap, (L, cap)   # doubling hits cap exactly
            lo = V[:cap] <= V[cap:]
            V = jnp.where(lo, V[:cap], V[cap:])       # bitonic, exact
            PV = jnp.where(lo, PV[:cap], PV[cap:])
            S = cap
        # output directions: halves for the next phase-A pairing;
        # even-asc when producing the 8 phase-B column lists.
        # (1, 1, c2, bq2): broadcasts against the (nb, j, c2, bq2)
        # stage operands
        pos = lax.broadcasted_iota(jnp.int32, (1, 1, c2, bq2), 2)
        up = (pos < c2 // 2) if c2 > 8 else (pos % 2 == 0)
        j = S // 2
        while j >= 1:
            nb = S // (2 * j)
            V4 = V.reshape(nb, 2, j, c2, bq2)
            P4 = PV.reshape(nb, 2, j, c2, bq2)
            a, b = V4[:, 0], V4[:, 1]
            pa, pb = P4[:, 0], P4[:, 1]
            lo = a <= b
            vmin = jnp.where(lo, a, b)
            vmax = jnp.where(lo, b, a)
            pmin = jnp.where(lo, pa, pb)
            pmax = jnp.where(lo, pb, pa)
            V = jnp.stack([jnp.where(up, vmin, vmax),
                           jnp.where(up, vmax, vmin)],
                          axis=1).reshape(S, c2, bq2)
            PV = jnp.stack([jnp.where(up, pmin, pmax),
                            jnp.where(up, pmax, pmin)],
                           axis=1).reshape(S, c2, bq2)
            j //= 2
        K, P, L, c = V, PV, S, c2

    # ---- phase B: (L8, 8, bq2), column-block lists, rolls ----
    L8, Lb = L, L
    col = lax.broadcasted_iota(jnp.int32, (1, 8, bq2), 1)

    def _roll_cmpx(K, P, D, sel_min):
        """Compare-exchange with the partner at column distance D
        (rank-stride >= L8). ``sel_min``: mask, True where this
        element keeps the pair min."""
        first = (col // D) % 2 == 0
        pk = jnp.where(first, pltpu.roll(K, 8 - D, 1),
                       pltpu.roll(K, D, 1))
        pp = jnp.where(first, pltpu.roll(P, 8 - D, 1),
                       pltpu.roll(P, D, 1))
        # strict compare on the pair's SECOND element: each element
        # resolves its exchange independently here (unlike the paired
        # stack stages), so a tie — possible across lanes, when two
        # candidates share truncated score AND per-lane row id — must
        # break by position or both sides would keep the same payload,
        # duplicating one gid and losing the other. (Spelled with
        # logical ops: Mosaic rejects ``where`` on i1 operands.)
        lo = (K < pk) | ((K == pk) & first)
        nK = jnp.where(sel_min, jnp.where(lo, K, pk),
                       jnp.where(lo, pk, K))
        nP = jnp.where(sel_min, jnp.where(lo, P, pp),
                       jnp.where(lo, pp, P))
        return nK, nP

    for rb in range(3):
        w = 1 << rb                     # input span width in columns
        nb = Lb // L8                   # valid columns per input list
        out_asc = (col // (2 * w)) % 2 == 0
        first_w = (col // w) % 2 == 0
        Sl = 2 * Lb
        if Sl > cap:
            assert Lb == cap, (Lb, cap)
            K, P = _roll_cmpx(K, P, w, first_w)   # keep min at A-cols
            Sl = cap
        sigma = Sl // 2
        while sigma >= 1:
            if sigma >= L8:
                db = sigma // L8
                D = w if db >= nb else db
                K, P = _roll_cmpx(K, P, D,
                                  ((col // D) % 2 == 0) == out_asc)
            else:
                nbl = L8 // (2 * sigma)
                V4 = K.reshape(nbl, 2, sigma, 8, bq2)
                P4 = P.reshape(nbl, 2, sigma, 8, bq2)
                a, b = V4[:, 0], V4[:, 1]
                pa, pb = P4[:, 0], P4[:, 1]
                lo = a <= b
                vmin = jnp.where(lo, a, b)
                vmax = jnp.where(lo, b, a)
                pmin = jnp.where(lo, pa, pb)
                pmax = jnp.where(lo, pb, pa)
                K = jnp.stack([jnp.where(out_asc, vmin, vmax),
                               jnp.where(out_asc, vmax, vmin)],
                              axis=1).reshape(L8, 8, bq2)
                P = jnp.stack([jnp.where(out_asc, pmin, pmax),
                               jnp.where(out_asc, pmax, pmin)],
                              axis=1).reshape(L8, 8, bq2)
            sigma //= 2
        Lb = Sl

    # extraction: final asc list = columns [0, cap/L8), rank-major
    outs_k, outs_p = [], []
    for b in range(cap // L8):
        mk = col == b
        outs_k.append(jnp.min(jnp.where(mk, K, imax), axis=1))
        outs_p.append(jnp.sum(jnp.where(mk, P, 0), axis=1))
    keys_ref[...] = (jnp.concatenate(outs_k, axis=0)
                     if len(outs_k) > 1 else outs_k[0])
    lanes_ref[...] = (jnp.concatenate(outs_p, axis=0)
                      if len(outs_p) > 1 else outs_p[0])


def _tail_candidates_pallas(outp_rows: Array, nq: int, r: int, k: int,
                            idbits: int, interpret: bool = False,
                            score16: bool = False):
    """`_packed_candidates` semantics via the in-VMEM `_tail_kernel`:
    (trunc scores (nq, k), gids (nq, k), tau (nq,) packed boundary
    keys). ``outp_rows`` is the scan's (r, LANES, nqp) key buffer."""
    nqp = outp_rows.shape[2]
    bq2 = 128
    rpad = 1 << max(0, (r - 1).bit_length())
    cap = min(1 << max(0, (k - 1).bit_length()), rpad * LANES)
    L0 = min(cap, rpad)
    if nqp % bq2 or cap > 1024 or L0 > 32:
        # tiny query batches, or configs whose working set would blow
        # the 16 MB scoped-VMEM budget: host XLA selection instead
        return _packed_candidates(outp_rows, nq, r, k, idbits,
                                  score16=score16)
    kern = functools.partial(_tail_kernel, r=r, L0=L0, cap=cap, bq2=bq2)
    keys, lanes = pl.pallas_call(
        kern,
        grid=(nqp // bq2,),
        in_specs=[pl.BlockSpec((r, LANES, bq2), lambda qb: (0, 0, qb),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((cap, bq2), lambda qb: (0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, bq2), lambda qb: (0, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cap, nqp), jnp.int32),
            jax.ShapeDtypeStruct((cap, nqp), jnp.int32),
        ),
        # worst case (r=28, cap=1024) peaks ~17.4 MB of scoped VMEM —
        # above the 16 MB compiler default, well under the chip's
        # 128 MB; no DMA pipelining in this kernel to starve
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(outp_rows)
    skeys = keys[:k, :nq].T                           # (nq, k) asc
    slanes = lanes[:k, :nq].T
    ids = (skeys & jnp.int32((1 << idbits) - 1)) * LANES + slanes
    vals = _decode_packed_vals(skeys, idbits, score16)
    return vals, ids, skeys[:, k - 1]


def _cmpx_stage(ka: Array, la: Array, j: int) -> tuple[Array, Array]:
    """One ascending compare-exchange stage (stride ``j``) along axis 0
    of (s, ...) key + payload arrays."""
    s = ka.shape[0]
    rest = ka.shape[1:]
    nb = s // (2 * j)
    kb = ka.reshape(nb, 2, j, *rest)
    lb = la.reshape(nb, 2, j, *rest)
    a, b = kb[:, 0], kb[:, 1]
    pa, pb = lb[:, 0], lb[:, 1]
    lo = a <= b
    ka = jnp.stack([jnp.where(lo, a, b), jnp.where(lo, b, a)],
                   axis=1).reshape(s, *rest)
    la = jnp.stack([jnp.where(lo, pa, pb), jnp.where(lo, pb, pa)],
                   axis=1).reshape(s, *rest)
    return ka, la


def _merge_pairs(keys: Array, lanes: Array, cap: int
                 ) -> tuple[Array, Array]:
    """One lane-merge round: ``keys (L, c, nq)`` is ``c`` ascending
    lists per query (L <= cap); merge adjacent pairs →
    (min(2L, cap), c//2, nq) ascending, discarding ranks beyond
    ``cap``. All reshapes/slices touch leading axes only (nq stays
    minor — no relayout)."""
    L, c, nq = keys.shape
    k4 = keys.reshape(L, c // 2, 2, nq)
    l4 = lanes.reshape(L, c // 2, 2, nq)
    # second list of each pair reversed → desc ++ asc = bitonic
    ka = jnp.concatenate([k4[:, :, 0], jnp.flip(k4[:, :, 1], axis=0)],
                         axis=0)                      # (2L, c/2, nq)
    la = jnp.concatenate([l4[:, :, 0], jnp.flip(l4[:, :, 1], axis=0)],
                         axis=0)
    if 2 * L > cap:
        # lists already at the cap (L == cap, since lengths double up
        # to cap): after the first stage the halves are elementwise
        # ordered, so the upper half can never reach the top-``cap``;
        # drop it, then finish merging the bitonic lower half.
        assert L == cap, (L, cap)
        ka, la = _cmpx_stage(ka, la, L)
        ka, la = ka[:cap], la[:cap]
    s = ka.shape[0]
    for j in (s // 2 >> i for i in range(max(0, s.bit_length() - 1))):
        ka, la = _cmpx_stage(ka, la, j)
    return ka, la


def _packed_candidates(outp, nq: int, r: int, k: int, idbits: int,
                       score16: bool = False):
    """Packed key buffer → (trunc scores (nq,k), gids (nq,k),
    tau (nq,) packed boundary keys), ranked by the packed total order.

    Selection is a bitonic merge TREE over the 128 per-lane lists,
    exploiting that each lane's buffer is already sorted ascending —
    O(log 2L) stages per round instead of a from-scratch sort, with
    every op on leading axes of (slots, lists, nq) arrays (the minor
    nq axis never relayouts); lists are truncated to the next power of
    two >= k as they grow (an element ranked >= k within its own list
    can never be in the global top-k). Replaces the transpose +
    ``lax.top_k`` + gather formulation, which measured 199 ms at
    k=1000 (r=28, nq=1e4, 1x v5e) — more than the scan kernel
    itself."""
    rpad = 1 << max(0, (r - 1).bit_length())
    cap = 1 << max(0, (k - 1).bit_length())
    cap = min(cap, rpad * LANES)                      # both powers of 2
    keys = outp[:, :, :nq]                            # (r, LANES, nq)
    L = min(cap, rpad)
    if r > L:
        # per-lane rank >= cap → global rank >= cap >= k: safe to drop
        keys = keys[:L]
    elif L > r:
        keys = jnp.concatenate(
            [keys, jnp.full((L - r, LANES, nq),
                            jnp.iinfo(jnp.int32).max, jnp.int32)],
            axis=0)
    lanes = jnp.broadcast_to(
        jnp.arange(LANES, dtype=jnp.int32)[None, :, None],
        (L, LANES, nq))
    c = LANES
    while c > 1:
        keys, lanes = _merge_pairs(keys, lanes, cap)
        c //= 2
    skeys = keys[:k, 0].T                             # (nq, k) asc
    slanes = lanes[:k, 0].T
    ids = (skeys & jnp.int32((1 << idbits) - 1)) * LANES + slanes
    vals = _decode_packed_vals(skeys, idbits, score16)
    return vals, ids, skeys[:, k - 1]


def candidate_ids(outi: Array, nq: int, r: int) -> Array:
    """f32-mode id buffer (r, LANES, nqp) of FULL global ids →
    (nq, rL) candidate matrix."""
    return outi[:, :, :nq].reshape(r * LANES, nq).T


@functools.partial(
    jax.jit, static_argnames=("qbias", "k", "r", "bq", "tile", "verify",
                              "interpret", "pack", "keep", "tail",
                              "vmem_mb", "stage", "premin", "score16"))
def pallas_scan_topk(Q: Array, Xd: Array, x2: Array, *, k: int,
                     r: int = 48, bq: int = 128, tile: int = 2048,
                     verify: bool = True, interpret: bool = False,
                     pack: bool = False, keep: int = 0,
                     tail: bool | None = None,
                     vmem_mb: int | None = None,
                     stage: int = 0,
                     premin: int = 0,
                     qbias: bool = False,
                     score16: bool = False) -> tuple[Array, Array, Array]:
    """Exact-unless-flagged top-k ADC scan over a decoded base.

    Args:
      Q: (nq, d) queries. Xd: (n, d) decoded base. x2: (n,) norm terms
        (|x_hat|^2, or the quantized-norms table values for LSQ-style
        search). All f32 or bf16 (scores accumulate f32 either way).
      k: neighbors (must be <= r * 128).
      r: per-lane buffer depth; the exactness check is count <= r.
      verify: emit per-query overflow flags. In pack32 mode this is
        FREE — the scan emits its own certificate (buffer r-th key +
        per-tile discard bound) instead of a second counting pass; the
        f32 mode still runs the counting kernel.
      pack: pack32 selection — each element is ONE uint32
        (sortable-score top bits | row id low bits), a TOTAL order
        with ~2.5x less selection work. The result is the exact top-k
        of the TRUNCATED scores (19 value bits at SIFT1M size — finer
        than bf16), certified by the same per-lane count in packed
        space; returned distances carry the truncation.
      keep: pack32-only pre-reduction — reduce each tile to its
        per-lane top-``keep`` before the buffer merge
        (`_prered_topk`). Exactness gains a second certificate
        condition (no (lane, tile) holds more than ``keep`` of the
        top-k), counted by the verification kernel. Requires
        ``r + keep`` and ``tile/(128*keep)`` powers of two.
      tail: run the cross-lane candidate selection as a second Pallas
        kernel (`_tail_kernel`, VMEM-resident merge tree) instead of
        host XLA. Default: on for compiled packed runs, off in
        interpret mode (the kernel is equivalence-tested separately).
      stage: pack32+keep-only — merge the running buffer once every
        ``stage`` tiles (staging the per-tile pre-reduced keys in
        between) instead of every tile; requires ``r + keep*stage`` a
        power of two. Identical results and flag rate, less VPU work.
      premin: pack32-only LOSSY pre-filter — ``premin`` pairwise-min
        halving stages on the packed keys before the top-``keep``
        reduction (`_premin`: one vector op per pair, the cheapest
        possible selection work). A top-k element is dropped iff a
        smaller element shares its ``2^premin``-row window (expected
        ~(2^premin−1)·k²/2n of the time per query); every drop is
        caught by the discard-min certificate and the query re-runs
        exactly, so the combined result is exact — this trades a small
        flag rate for ~2x less selection arithmetic at small k.
      qbias: pack32-only — feed per-query |q|^2 into the kernel and
        clamp scores at +0.0, so keys are a plain int32 bitcast (one
        fewer full-size VPU op than the signed sortable transform;
        near-zero distances clamp to exactly 0.0 and rank by row id).
      score16: pack32-only — the distance block leaves the MXU as
        BF16 and the key's value field is its sign-fixed 16 bits
        (`_row_key16`): halves the score-block VMEM traffic that
        dominates the kernel floor, at bf16 score resolution (the
        result is the exact top-k of the BF16-ROUNDED scores, same
        contract shape as the f32-truncated keys; certificate
        unchanged). Requires ``idbits <= 15`` (n <= 4.2M per call).

    Returns ``(dists (nq, k), ids (nq, k), flagged (nq,) bool)``.
    Flagged queries must be re-run via the exact XLA path (done by
    `rayuela_tpu.search.linscan` front-ends).
    """
    nq, d = Q.shape
    n = Xd.shape[0]
    if k > r * LANES:
        raise ValueError(f"k={k} > r*128={r * LANES}")
    rows = tile // LANES
    if rows & (rows - 1):
        raise ValueError(f"tile/128={rows} must be a power of two")
    if premin:
        if not pack:
            raise ValueError("premin pre-filter requires pack=True")
        if premin < 0 or (rows >> premin) < max(1, keep):
            raise ValueError(f"premin={premin} must leave tile/128 >> "
                             f"premin >= max(1, keep={keep})")
    rows_eff = rows >> premin
    if keep:
        if not pack:
            raise ValueError("keep pre-reduction requires pack=True")
        if keep & (keep - 1) or keep > rows_eff:
            raise ValueError(f"keep={keep} must be a power of two "
                             f"<= (tile/128)>>premin={rows_eff}")
        w = r + keep * max(1, stage)
        if w & (w - 1):
            raise ValueError(f"r+keep*stage={w} must be a power of "
                             "two (bitonic merge width)")
        if stage and keep >= rows_eff:
            raise ValueError("staged merge requires keep < "
                             "(tile/128)>>premin")
        if stage and (keep * stage) & (keep * stage - 1):
            raise ValueError(f"keep*stage={keep * stage} must be a "
                             "power of two (staging-sort width)")
    elif stage:
        raise ValueError("stage requires keep pre-reduction")
    elif (r + rows_eff) & (r + rows_eff - 1):
        raise ValueError(f"r+(tile/128)>>premin={r + rows_eff} must be "
                         "a power of two (bitonic merge width)")
    dp = cdiv(d, LANES) * LANES
    npad = cdiv(n, tile) * tile
    nqp = cdiv(nq, bq) * bq
    ntiles, nqb = npad // tile, nqp // bq
    idbits = _pack_idbits(pack, npad)
    if pack and not idbits:
        # beyond the 16-bit row-id field the packed keys are malformed
        # and the compile fails opaquely (observed at n=9.1e6) —
        # callers segment (`search`, `mesh._scan_shard_segments_decoded`)
        raise ValueError(
            f"n={n} (padded {npad}) exceeds the pack32 row-id range "
            f"({_SEG_DECODED} rows/call); segment the base")

    # A bf16 index halves the X-tile DMA and doubles MXU rate; match
    # the query operand so the distance matmul is single-dtype
    # (f32 accumulation either way).
    QT = _pad2(Q, nqp, dp).astype(Xd.dtype).T        # (dp, nqp)
    Xp = _pad2(Xd, npad, dp)
    x2p = jnp.pad(x2.reshape(-1, 1), ((0, npad - n), (0, 0)),
                  constant_values=jnp.inf)

    in_specs = [
        pl.BlockSpec((dp, bq), lambda qb, t: (0, qb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, dp), lambda qb, t: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda qb, t: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    kk = min(k, n)
    q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)
    if qbias and not idbits:
        raise ValueError("qbias requires pack=True")
    if score16:
        if not idbits:
            raise ValueError("score16 requires pack=True")
        if qbias:
            raise ValueError("score16 and qbias are exclusive")
        if idbits > 15:
            raise ValueError(f"score16 needs idbits <= 15 (16 value "
                             f"bits + {idbits} rid bits > 31); "
                             "segment the base")

    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=vmem_mb * 1024 * 1024)
        if vmem_mb else None)
    if idbits:
        inputs = (QT, Xp, x2p)
        if qbias:
            in_specs = in_specs + [
                pl.BlockSpec((1, bq), lambda qb, t: (0, qb),
                             memory_space=pltpu.VMEM)]
            inputs = inputs + (_pad2(q2.T, 1, nqp),)
        if stage:
            kern = functools.partial(
                _scan_kernel_packed_staged, rows=rows, r=r,
                ntiles=ntiles, bq=bq, idbits=idbits, keep=keep,
                stage=stage, premin=premin, qbias=qbias,
                score16=score16)
            scratch = [
                pltpu.VMEM((r, LANES, bq), jnp.int32),
                pltpu.VMEM((keep * stage, LANES, bq), jnp.int32),
                pltpu.VMEM((1, LANES, bq), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kern = functools.partial(_scan_kernel_packed, rows=rows,
                                     r=r, ntiles=ntiles, bq=bq,
                                     idbits=idbits, keep=keep,
                                     premin=premin, qbias=qbias,
                                     score16=score16)
            scratch = [
                pltpu.VMEM((r, LANES, bq), jnp.int32),
                pltpu.VMEM((1, LANES, bq), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        outp = pl.pallas_call(
            kern,
            grid=(nqb, ntiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((r + 1, LANES, nqp),
                                           jnp.int32),
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(*inputs)
        if tail is None:
            tail = not interpret
        if tail:
            vals, ids, tau_k = _tail_candidates_pallas(
                outp[:r], nq, r, kk, idbits, interpret=interpret,
                score16=score16)
        else:
            vals, ids, tau_k = _packed_candidates(outp[:r], nq, r, kk,
                                                  idbits,
                                                  score16=score16)
        # qbias kernels already fold |q|^2 into the score
        dists = vals if qbias else vals + q2
        if not verify:
            return dists, ids, jnp.zeros((nq,), bool)
        # In-scan EXACT certificate — no counting pass: row r is the
        # min over every discarded/evicted key per lane, i.e. the best
        # non-candidate; the top-k is exact iff no lane's best
        # non-candidate beats the k-th candidate key.
        flagged = jnp.any(outp[r, :, :nq] < tau_k[None, :], axis=0)
        return dists, ids, flagged
    else:
        kern = functools.partial(_scan_kernel, rows=rows, r=r,
                                 ntiles=ntiles, bq=bq)
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
        )(QT, Xp, x2p)
        # exact top-k among the r*128 candidates (small, fast in XLA)
        cand_v = outv[:, :, :nq].reshape(r * LANES, nq).T
        cand_i = candidate_ids(outi, nq, r)
        neg, loc = lax.top_k(-cand_v, kk)
        dists = -neg + q2
        ids = jnp.take_along_axis(cand_i, loc, axis=1)
        # k-th value per query in kernel-score space; padded queries
        # get -inf so they never flag
        tau = jnp.full((nqp,), -jnp.inf, jnp.float32)
        tau = tau.at[:nq].set(-neg[:, kk - 1])

    if not verify:
        return dists, ids, jnp.zeros((nq,), bool)

    tau = jnp.broadcast_to(tau[None, :], (LANES, nqp))
    vkern = functools.partial(_verify_kernel, rows=rows, ntiles=ntiles,
                              idbits=idbits)
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
    )(QT, Xp, x2p, tau)
    flagged = jnp.any(cnt[0, :, :nq] > r, axis=0)
    return dists, ids, flagged


@functools.partial(
    jax.jit, static_argnames=("k", "r", "bq", "tile", "interpret",
                              "keep", "vmem_mb", "stage", "premin",
                              "nr", "qbias", "score16"))
def _scan_premin_inline(Q: Array, Xd: Array, x2: Array, *, k: int,
                        r: int, bq: int, tile: int, keep: int,
                        stage: int, premin: int, nr: int,
                        vmem_mb: int | None = None,
                        interpret: bool = False, qbias: bool = False,
                        score16: bool = False
                        ) -> tuple[Array, Array, Array]:
    """premin scan + IN-GRAPH exact-kernel rescue — one dispatch.

    The round-2 premin sweep measured +15-23% kernel-level at k=100
    but a LOSS end-to-end: the host-side rescue ladder cost one extra
    dispatch + tunnel round-trip, which outweighed the kernel saving
    in this environment (BASELINE.md). This wrapper folds the rescue
    into the same jit: the lossy premin scan runs for all queries,
    then up to ``nr`` flagged queries re-run through the exact kernel
    (premin=0) over the same index INSIDE the graph (a fixed-slot
    gather via `lax.top_k` on the flag vector — top-k indices are
    distinct and flagged-first), and the repaired results scatter
    back. The returned flag vector covers only what remains unproven:
    flag overflow beyond ``nr`` slots, or the rescue kernel's own
    (certificate) flags — both vanishingly rare; the host falls back
    to the XLA rescan for those exactly as before.

    Cost when nothing is flagged: one extra ``nr``-query kernel pass
    (~nr/nq of the main scan) — vs the measured ~1 RTT the host-side
    ladder paid per call."""
    nq = Q.shape[0]
    d1, i1, fl = pallas_scan_topk(
        Q, Xd, x2, k=k, r=r, bq=bq, tile=tile, verify=True,
        interpret=interpret, pack=True, keep=keep, vmem_mb=vmem_mb,
        stage=stage, premin=premin, qbias=qbias, score16=score16)
    nr = min(nr, nq)
    fli = fl.astype(jnp.int32)
    _, qidx = lax.top_k(fli, nr)             # flagged-first, distinct
    # rescue query-block width must stay LANE-ALIGNED: the kernel's
    # output DMA slices the minor axis at bq stride (Mosaic rejects
    # non-128-multiples; found via nq=200 in the HPO run)
    bq2 = min(bq, max(LANES, -(-nr // LANES) * LANES))
    d2, i2, f2 = pallas_scan_topk(
        Q[qidx], Xd, x2, k=k, r=r, bq=bq2,
        tile=tile, verify=True, interpret=interpret, pack=True,
        keep=keep, vmem_mb=vmem_mb, stage=stage, premin=0, qbias=qbias,
        score16=score16)
    sel = fl[qidx]                           # real flags among slots
    d1 = d1.at[qidx].set(jnp.where(sel[:, None], d2, d1[qidx]))
    i1 = i1.at[qidx].set(jnp.where(sel[:, None], i2, i1[qidx]))
    rescued = jnp.zeros((nq,), bool).at[qidx].set(sel & ~f2)
    # un-slotted flags (overflow beyond nr) stay set in fl & ~rescued
    return d1, i1, fl & ~rescued


class LinscanIndex:
    """A decoded, scan-ready base set: build once, search many times.

    The reference rebuilds per-query LUTs on every call; here the
    (n, d) decode + norm terms are the index (built once via
    `decode_base`), and each `search` is one fused Pallas scan."""

    def __init__(self, Xd: Array, x2: Array):
        self.Xd, self.x2 = Xd, x2
        self.n = Xd.shape[0]


def build_index(C: Array, B: Array, *, pq: bool = False,
                d: int | None = None, norm_term: Array | None = None,
                dtype=None) -> LinscanIndex:
    """``dtype=None`` picks bf16 on TPU (half the HBM and DMA, double
    the MXU rate; scores keep f32 accumulation — with pack32's 19-bit
    truncation the extra rounding is in the same error class) and f32
    elsewhere (CPU tests compare exactly)."""
    if dtype is None:
        dtype = (jnp.float32 if jax.default_backend() == "cpu"
                 else jnp.bfloat16)
    Xd, x2 = decode_base(C, B, pq=pq, d=d, norm_term=norm_term,
                         dtype=dtype)
    return LinscanIndex(Xd, x2)


def _auto_config(k: int, nq: int, pack: bool, f32_index: bool = False,
                 n: int | None = None):
    """Measured-best (r, bq, tile, keep, stage, premin) per k class (1x v5e
    sweeps: demos/bench_prered.py, /tmp/cert2, /tmp/bench_staged.py,
    2026-08-17). With keep pre-reduction + the in-scan certificate +
    the staged buffer merge: k=100 77.5k qps kernel-level at
    (16, 256, 4096, keep=2, stage=8) on a bf16 index, k=1000 59.6k at
    (32, 256, 4096, 4, 8) — the staged merge runs the (r+keep*stage)
    buffer merge once per `stage` tiles, worth ~7% at k=1000 over the
    per-tile merge. The tile=4096 configs exceed VMEM with an f32
    index (the compiler crashes), so f32 falls back to the measured
    tile=2048 per-tile-merge equivalents. f32+i32 selection mode keeps
    the round-1 configs (its buffers are 2x).

    ``premin=2`` (lossy pairwise pre-min + IN-GRAPH fixed-slot rescue,
    `_scan_premin_inline`) turns on for the small-k class when the
    expected flagged-query count ~nq*(2^premin-1)*k^2/(2n) stays well
    under the rescue slots: measured e2e through search() 2026-08-19
    (/tmp/exp_premin.log, interleaved NQ=1e4): premin=2 114.9k qps vs
    104.1k at premin=0 (+10.4%), bit-identical results; premin=3
    overflows the slots (380 flags > 256) and collapses to 77k. The
    round-2 host-side rescue ladder LOST e2e (BASELINE.md) — the
    in-graph rescue is what made premin net-positive."""
    premin = 0
    if not pack:
        return (16 if k <= 512 else 48), 128, 2048, 0, 0, 0
    if f32_index:
        tile = 2048
        if k <= 512:
            r, bq, keep, stage = 14, 512, 2, 0
        elif k <= 28 * LANES:
            r, bq, keep, stage = 28, 256, 4, 0
        else:
            # same under-provisioning fix as the bf16 branch below
            r, bq, keep, stage = 96, 128, 8, 4
    else:
        # tile=8192 re-swept 2026-08-18 (/tmp/sweep_dec{,2,3}.py): with
        # the staged merge its certificate flags dropped to single
        # digits on both uniform and clustered data (they dominated
        # pre-stage), and it wins both k classes: k=1000 73.6k qps vs
        # 62.8k at tile=4096, k=100 101.0k vs 98.1k (clustered run).
        tile = 8192
        if k <= 512:
            r, bq, keep, stage = 16, 256, 2, 8
            if (n is not None
                    and nq * 1.5 * k * k / max(n, 1) <= 0.8 * _PREMIN_NR):
                premin = 2
        elif k <= 32 * LANES:
            r, bq, keep, stage = 32, 256, 4, 8
        else:
            # big-k class swept 2026-08-19 (/tmp/exp_bigk2.log): the
            # old (56, 128, 4096, 8, 0) config under-provisioned the
            # per-lane buffer — at k=6144 the expected per-lane count
            # is 48 (sigma ~7), so r=56 overflowed for EVERY query
            # (4096/4096 flagged -> silent ~100x XLA fallback). r=96
            # holds +4 sigma at k=8192: 36/4096 flags, 9.9k qps; best
            # of {tile 4096/8192, keep 8 stage 4, keep 32 per-tile,
            # bq 128/256} was (96, 128, 8192, 8, 4).
            r, bq, keep, stage = 96, 128, 8, 4
    # don't pad tiny query batches up to a huge block
    bqnq = max(128, 1 << (nq - 1).bit_length())
    return r, min(bq, bqnq), tile, keep, stage, premin


# decoded-path segment size: the largest base whose padded rows fit
# the 16-bit pack32 row-id field (mirrors `scan_codes_pallas._DECODE_SEG`)
_SEG_DECODED = (1 << 16) * LANES


@functools.partial(jax.jit,
                   static_argnames=("k", "r", "bq", "tile", "keep",
                                    "stage", "vmem_mb", "nfull", "rem",
                                    "interpret", "qbias"))
def _scan_topk_segments(Q, Xd, x2, *, k, r, bq, tile, keep, stage,
                        vmem_mb, nfull, rem, interpret, qbias=False):
    """Decoded bases beyond the pack32 row-id range: run the fused
    kernel per `_SEG_DECODED`-row segment (static Python loop — at
    most ~6 segments fit HBM decoded) with an exact on-device top-k
    merge; per-segment certificate flags OR together for the caller's
    one host check. ``qbias`` is per-call kernel machinery and passes
    straight through (each segment is a full kernel call)."""
    seg = _SEG_DECODED
    best_d = best_i = fl_any = None
    sizes = [seg] * nfull + ([rem] if rem else [])
    for si, sz in enumerate(sizes):
        st = si * seg
        Xs = lax.dynamic_slice(Xd, (st, 0), (sz, Xd.shape[1]))
        x2s = lax.dynamic_slice(x2, (st,), (sz,))
        dv, iv, fl = pallas_scan_topk(
            Q, Xs, x2s, k=min(k, sz), r=r, bq=bq, tile=tile,
            verify=True, interpret=interpret, pack=True, keep=keep,
            stage=stage, vmem_mb=vmem_mb, qbias=qbias)
        iv = iv + st
        if best_d is None:
            best_d, best_i, fl_any = dv, iv, fl
        else:
            cd = jnp.concatenate([best_d, dv], axis=1)
            ci = jnp.concatenate([best_i, iv], axis=1)
            neg, loc = lax.top_k(-cd, k)
            best_d = -neg
            best_i = jnp.take_along_axis(ci, loc, axis=1)
            fl_any = fl_any | fl
    return best_d, best_i, fl_any


def search(index: LinscanIndex, Q: Array, k: int, *, r: int | None = None,
           bq: int | None = None, tile: int | None = None,
           interpret: bool = False, pack: bool | None = None,
           keep: int | None = None,
           vmem_mb: int | None = None,
           premin: int | None = None,
           qbias: bool | None = None,
           score16: bool | None = None) -> tuple[Array, Array]:
    """Exact top-k search: Pallas fast path + XLA re-run for any query
    the verification kernel flags (host-side check, so shapes stay
    static under jit).

    ``r``/``bq``/``tile`` default to the measured-best configuration
    for the k class (`_auto_config`); overflows beyond the per-lane
    buffer depth are caught by the verification kernel and re-run
    exactly either way.

    ``pack`` (default: on for compiled TPU runs) packs (score, row id)
    into one int32 selection key — less selection work and half the
    buffer VMEM; the result is the exact top-k of the truncated scores
    (see `pallas_scan_topk`)."""
    k = min(k, index.n)       # never return padded (inf, fake-id) rows
    premin_arg = bool(premin)          # explicitly requested modes,
    score16_arg = score16 is True      # before auto-config defaults
    if k > 96 * LANES and r is None:
        # beyond the deepest swept kernel config's buffer (r=96): the
        # exact XLA path handles any k <= n (out-of-protocol regime —
        # the reference caps at knn=1000)
        from rayuela_tpu.search.linscan import exact_rescan
        return exact_rescan(Q, index.Xd, index.x2, k=k)
    if pack is None:
        pack = not interpret
    ar, abq, atile, akeep, astage, apremin = _auto_config(
        k, Q.shape[0], pack, f32_index=index.Xd.dtype == jnp.float32,
        n=index.n)
    stage = astage
    if r is not None or keep is not None or tile is not None:
        stage = 0             # explicit config: per-tile merge semantics
        apremin = 0
    r = ar if r is None else r
    bq = abq if bq is None else bq
    tile = atile if tile is None else tile
    keep = akeep if keep is None else keep
    premin = apremin if premin is None else premin
    if qbias is None:
        qbias = pack and _QBIAS_DEFAULT
    qbias = qbias and pack
    if score16 is None:
        score16 = pack and not qbias and _SCORE16_DEFAULT
    # score16 needs 16 value + idbits rid bits in one i32
    score16 = (score16 and pack and not qbias
               and cdiv(index.n, tile) * tile // LANES <= (1 << 15))
    if vmem_mb is None and (tile > 4096 or stage):
        vmem_mb = 64          # beyond the 16 MB scoped-VMEM default
    if pack and cdiv(index.n, tile) * tile > _SEG_DECODED:
        # beyond the pack32 row-id range (8.4M rows/call, same bound
        # as the codes path): segment on device with an exact merge.
        # Without this the kernel compile failed opaquely at n=9.1e6 —
        # a size that fits HBM decoded (round 4). Flags defer to one
        # combined host check. qbias passes through (per-segment
        # valid); premin's in-graph rescue slots and score16's 16-bit
        # row-id budget are per-call machinery that cannot span
        # segments — warn instead of silently discarding when the
        # caller asked for them explicitly (ADVICE r4); results stay
        # exact either way.
        if premin_arg or score16_arg:
            import warnings
            warnings.warn(
                "segmented decoded scan (n > 8.4M padded rows): "
                "explicitly requested "
                + "/".join([s for s, v in
                            (("premin", premin_arg),
                             ("score16", score16_arg)) if v])
                + " cannot run on the segmented path and will be "
                "ignored (results remain exact)", stacklevel=2)
        dists, ids, flagged = _scan_topk_segments(
            Q, index.Xd, index.x2, k=k, r=r, bq=bq, tile=tile,
            keep=keep, stage=stage, vmem_mb=vmem_mb,
            nfull=index.n // _SEG_DECODED, rem=index.n % _SEG_DECODED,
            interpret=interpret, qbias=qbias)
    elif premin and pack:
        # lossy pre-filter + IN-GRAPH fixed-slot exact rescue: one
        # dispatch total (the host-side rescue ladder's extra dispatch
        # + tunnel RTT made premin LOSE e2e in round 2, BASELINE.md)
        dists, ids, flagged = _scan_premin_inline(
            Q, index.Xd, index.x2, k=k, r=r, bq=bq, tile=tile,
            keep=keep, stage=stage, premin=premin, nr=_PREMIN_NR,
            vmem_mb=vmem_mb, interpret=interpret, qbias=qbias,
            score16=score16)
    else:
        dists, ids, flagged = pallas_scan_topk(
            Q, index.Xd, index.x2, k=k, r=r, bq=bq, tile=tile,
            verify=True, interpret=interpret, pack=pack, keep=keep,
            vmem_mb=vmem_mb, stage=stage, premin=premin, qbias=qbias,
            score16=score16)
    flagged = np.asarray(flagged)
    if flagged.any():
        from rayuela_tpu.search.linscan import exact_rescan
        qidx = np.nonzero(flagged)[0]
        d2, i2 = exact_rescan(Q[qidx], index.Xd, index.x2, k=k)
        dists = dists.at[qidx].set(d2)
        ids = ids.at[qidx].set(i2)
    return dists, ids


def search_streamed(C: Array, B, Q: Array, k: int, *,
                    pq: bool = False, d: int | None = None,
                    norm_term=None, shard_size: int = 1 << 20,
                    interpret: bool = False) -> tuple[Array, Array]:
    """Search a base set too large to decode into HBM at once: codes
    stream from host memory shard by shard (each shard is decoded,
    scanned with the fused kernel, and released), and the per-shard
    top-k lists merge exactly on host.

    The single-chip analogue of the reference's >GPU-memory tiling
    (``nsplits``, `src/LSQ_GPU.jl:218-264`) applied to the query path;
    on a pod slice, prefer `rayuela_tpu.parallel.mesh.sharded_scan_topk`
    (codes sharded across chips) instead.
    """
    n = B.shape[0]
    d = Q.shape[1] if d is None else d
    best_v = best_i = None
    for start in range(0, n, shard_size):
        stop = min(start + shard_size, n)
        Bs = jnp.asarray(B[start:stop])
        nt = None if norm_term is None else jnp.asarray(
            norm_term[start:stop])
        idx = build_index(C, Bs, pq=pq, d=d, norm_term=nt)
        dv, di = search(idx, Q, min(k, stop - start),
                        interpret=interpret)
        dv, di = np.asarray(dv), np.asarray(di) + start
        if best_v is None:
            best_v, best_i = dv, di
        else:
            cat_v = np.concatenate([best_v, dv], axis=1)
            cat_i = np.concatenate([best_i, di], axis=1)
            order = np.argsort(cat_v, axis=1)[:, :k]
            best_v = np.take_along_axis(cat_v, order, axis=1)
            best_i = np.take_along_axis(cat_i, order, axis=1)
    return jnp.asarray(best_v), jnp.asarray(best_i)


def decode_base(C: Array, B: Array, *, pq: bool = False,
                d: int | None = None, norm_term: Array | None = None,
                dtype=jnp.float32, chunk: int = 65536
                ) -> tuple[Array, Array]:
    """One-time base decode → ``(Xd (n, d), x2 (n,))`` for the scan.

    ``norm_term`` overrides the exact |x_hat|^2 (LSQ quantized norms /
    CQ codebook norms, reference `src/Linscan.jl:118-193`)."""
    from rayuela_tpu.ops.qerror import reconstruct, reconstruct_pq

    n = B.shape[0]
    nchunks = cdiv(n, chunk)
    pad = nchunks * chunk - n
    Bp = jnp.pad(B, ((0, pad), (0, 0)))

    def dec(Bc):
        Xc = reconstruct_pq(C, Bc, d) if pq else reconstruct(C, Bc)
        return Xc.astype(dtype), jnp.sum(Xc * Xc, axis=-1)

    Xd, x2 = lax.map(dec, Bp.reshape(nchunks, chunk, -1))
    Xd = Xd.reshape(nchunks * chunk, -1)[:n]
    x2 = x2.reshape(-1)[:n] if norm_term is None else norm_term
    return Xd, x2
