"""Device-mesh layout and sharded execution for the MCQ engine.

The reference's complete parallelism inventory (SURVEY.md §2.5 —
Julia ``Distributed`` workers + ``SharedArrays`` on one machine,
OpenMP threads inside the C++ kernels) maps here to one idiom:
a `jax.sharding.Mesh` with named axes and GSPMD partitioning.

Axes:
  * ``data``  — the n axis (training vectors / base-set codes). All
    training statistics (k-means counts/sums, fastbin B^T B / B^T X,
    objectives) are sums over n, so XLA inserts `psum` over ICI when X
    is sharded on ``data``.
  * ``model`` — the m axis (codebooks / subspaces). PQ/OPQ train m
    independent quantizers; sharding the leading vmap axis over
    ``model`` is tensor parallelism with zero communication.

Search: base codes sharded on ``data``, queries replicated; each shard
scans locally and keeps a local top-k; the (nq, k) partial lists
all-gather and merge — k ≪ n, so the collective is tiny (SURVEY.md
§2.5 north-star mapping).
"""

from __future__ import annotations

import functools as _functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def shard_data(mesh: Mesh, x: Array, axis: int = 0) -> Array:
    """Place ``x`` sharded along ``axis`` over the ``data`` mesh axis."""
    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, x: Array) -> Array:
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x: Array, mult: int, axis: int = 0, fill=0):
    """Pad ``x`` along ``axis`` to a multiple of ``mult`` (shard-evenly)."""
    n = x.shape[axis]
    pad = -n % mult
    if pad == 0:
        return x, n
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=fill), n


@_functools.lru_cache(maxsize=64)
def _sharded_scan_fn(mesh: Mesh, n: int, shard_n: int, klocal: int,
                     k: int, pq: bool, have_norms: bool, tile: int):
    """Build-and-cache the jitted sharded scan for one (mesh, shape,
    statics) signature — re-jitting per call was the 1-device ~2x
    wrapper overhead (every search retraced and recompiled)."""
    from jax import shard_map

    from rayuela_tpu.search.linscan import scan_topk

    ndata = mesh.shape["data"]

    def local(Q, C, B, nt):
        # Each shard scans its slice; ids are local → offset by shard.
        d, i = scan_topk(Q, C, B, k=klocal, pq=pq,
                         norm_term=nt if have_norms else None, tile=tile)
        shard = jax.lax.axis_index("data")
        i = i + shard * shard_n
        d = jnp.where(i < n, d, jnp.inf)
        if ndata == 1:                 # static: no merge needed
            return d[:, :k], i[:, :k]
        # All-gather partial lists along the k axis, merge with top_k.
        dg = jax.lax.all_gather(d, "data", axis=1, tiled=True)  # (nq, P*k)
        ig = jax.lax.all_gather(i, "data", axis=1, tiled=True)
        neg, loc = jax.lax.top_k(-dg, k)
        return -neg, jnp.take_along_axis(ig, loc, axis=1)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P("data", None), P("data")),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_scan_topk(mesh: Mesh, Q: Array, C: Array, B: Array, *,
                      k: int, pq: bool = False,
                      norm_term: Array | None = None,
                      tile: int = 1 << 14):
    """Data-parallel ADC scan: codes sharded over ``data``, queries
    replicated; local top-k per shard, then a top-k merge of the
    all-gathered partial lists (exact — the global top-k is contained in
    the union of per-shard top-k).

    TPU-native replacement for the reference's OpenMP scan over one
    host's memory (`deps/src/linscan_aqd.cpp:55-61`); the merge is the
    all-gather step of SURVEY.md §2.5.
    """
    ndata = mesh.shape["data"]
    Bp, n = pad_to_multiple(B, ndata)
    shard_n = Bp.shape[0] // ndata
    have_norms = norm_term is not None
    if have_norms:
        nt, _ = pad_to_multiple(norm_term, ndata, fill=jnp.inf)
    else:  # placeholder so the shard_map signature is static
        nt = jnp.zeros((Bp.shape[0],), jnp.float32)

    # Padded rows decode to finite scores; requesting `pad` extra local
    # candidates keeps the merge exact even if fake rows rank high.
    klocal = min(k + (Bp.shape[0] - n), shard_n)
    fn = _sharded_scan_fn(mesh, n, shard_n, klocal, k, pq, have_norms,
                          tile)
    return fn(Q, C, Bp, nt)


@_functools.lru_cache(maxsize=64)
def _sharded_search_fn(mesh: Mesh, n: int, shard_n: int, klocal: int,
                       k: int, r: int, bq: int, tile: int,
                       interpret: bool, pack: bool, keep: int = 0,
                       stage: int = 0, vmem_mb: int | None = None):
    from jax import shard_map

    from rayuela_tpu.search.scan_pallas import pallas_scan_topk

    ndata = mesh.shape["data"]

    def local(Q, Xd, x2):
        def scan_one(Xs, x2s, kseg):
            return pallas_scan_topk(Q, Xs, x2s, k=kseg, r=r, bq=bq,
                                    tile=tile, verify=True,
                                    interpret=interpret, pack=pack,
                                    keep=keep, stage=stage,
                                    vmem_mb=vmem_mb)

        d, i, fl = _scan_shard_segments_decoded(
            scan_one, Xd, x2, Q.shape[0], klocal, pack)
        shard = jax.lax.axis_index("data")
        i = i + shard * shard_n
        d = jnp.where(i < n, d, jnp.inf)
        if ndata == 1:                 # static: no merge needed
            kk = min(k, klocal)
            return d[:, :kk], i[:, :kk], fl
        dg = jax.lax.all_gather(d, "data", axis=1, tiled=True)
        ig = jax.lax.all_gather(i, "data", axis=1, tiled=True)
        neg, loc = jax.lax.top_k(-dg, min(k, ndata * klocal))
        fl = jax.lax.psum(fl.astype(jnp.int32), "data") > 0
        return -neg, jnp.take_along_axis(ig, loc, axis=1), fl

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P("data", None), P("data")),
                   out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_search(mesh: Mesh, Xd: Array, x2: Array, Q: Array, *,
                   k: int, r: int | None = None, bq: int | None = None,
                   tile: int | None = None, interpret: bool = False,
                   pack: bool | None = None):
    """Multi-chip fused search: the DECODED index shards over ``data``
    (each chip holds n/P decoded rows — this is how a pod slice holds
    SIFT1B-class bases), queries replicate, each chip runs the fused
    Pallas scan kernel on its shard, and the (nq, k) partial lists
    merge with one all-gather + top-k.

    Returns ``(dists, ids, flagged)``; flagged queries (per-lane buffer
    overflow on some shard) should re-run via the exact XLA path
    (`sharded_scan_topk`) — same contract as the single-chip `search`.

    The jitted executable is cached per (mesh, shapes, statics) — see
    `_sharded_search_fn`.
    """
    from rayuela_tpu.search.scan_pallas import _auto_config

    ndata = mesh.shape["data"]
    Xp, n = pad_to_multiple(Xd, ndata)
    x2p, _ = pad_to_multiple(x2, ndata, fill=jnp.inf)
    shard_n = Xp.shape[0] // ndata
    klocal = min(k, shard_n)
    if pack is None:
        pack = not interpret
    ar, abq, atile, akeep, astage, _apremin = _auto_config(
        klocal, Q.shape[0], pack, f32_index=Xd.dtype == jnp.float32)
    stage = astage
    if r is not None or tile is not None:
        stage = 0             # explicit config: per-tile merge semantics
    r = ar if r is None else r
    bq = abq if bq is None else bq
    tile = atile if tile is None else tile
    fn = _sharded_search_fn(mesh, n, shard_n, klocal, k, r, bq, tile,
                            interpret, pack, akeep if pack else 0,
                            stage if pack else 0,
                            64 if (stage or tile > 4096) else None)
    return fn(Q, Xp, x2p)


def _scan_shard_segments_decoded(scan_one, Xd, x2, nq: int,
                                 klocal: int, pack: bool):
    """Decoded analogue of `_scan_shard_segments`: shards of a
    DECODED sharded index beyond the pack32 row-id range run the
    fused kernel per `_SEG_DECODED`-row segment with an exact
    in-shard merge (unpacked mode has no id field and needs none)."""
    from rayuela_tpu.search.scan_pallas import _SEG_DECODED
    seg = _SEG_DECODED
    shard_n = Xd.shape[0]
    if not pack or shard_n <= seg:
        return scan_one(Xd, x2, klocal)
    nfull, rem = shard_n // seg, shard_n % seg
    sizes = [seg] * nfull + ([rem] if rem else [])
    bs = bi = bf = None
    for si, sz in enumerate(sizes):
        st = si * seg
        Xs = jax.lax.dynamic_slice(Xd, (st, 0), (sz, Xd.shape[1]))
        x2s = jax.lax.dynamic_slice(x2, (st,), (sz,))
        s, i, fl = scan_one(Xs, x2s, min(klocal, sz))
        i = i + st
        if bs is None:
            bs, bi, bf = s, i, fl
        else:
            cs = jnp.concatenate([bs, s], axis=1)
            ci = jnp.concatenate([bi, i], axis=1)
            neg, loc = jax.lax.top_k(-cs, klocal)
            bs = -neg
            bi = jnp.take_along_axis(ci, loc, axis=1)
            bf = bf | fl
    return bs, bi, bf


def _scan_shard_segments(scan_one, packed, nq: int, klocal: int):
    """Run ``scan_one(packed_seg, kseg)`` over `_DECODE_SEG`-row
    segments of one shard with an exact in-shard top-k merge — lifts
    the kernel's per-call packed-id range (8.4M rows) to the whole
    shard, so e.g. SIFT1B on an 8-chip slice (1.25e8 rows/chip) runs
    without a host round-trip. The mirror of the single-chip
    segmented path (`scan_codes_pallas.search_codes`), inside
    `shard_map`."""
    from rayuela_tpu.search.scan_codes_pallas import _DECODE_SEG
    seg = _DECODE_SEG
    shard_n = packed.shape[0]
    if shard_n <= seg:
        return scan_one(packed, klocal)
    nfull, rem = shard_n // seg, shard_n % seg
    wpk = packed.shape[1]

    def merge(bs, bi, bf, s, i, fl):
        cs = jnp.concatenate([bs, s], axis=1)
        ci = jnp.concatenate([bi, i], axis=1)
        neg, loc = jax.lax.top_k(-cs, klocal)
        return -neg, jnp.take_along_axis(ci, loc, axis=1), bf | fl

    def body(carry, segi):
        pseg = jax.lax.dynamic_slice(packed, (segi * seg, 0),
                                     (seg, wpk))
        s, i, fl = scan_one(pseg, min(klocal, seg))
        return merge(*carry, s, i + segi * seg, fl), None

    init = (jnp.full((nq, klocal), jnp.inf, jnp.float32),
            jnp.zeros((nq, klocal), jnp.int32),
            jnp.zeros((nq,), jnp.bool_))
    (bs, bi, bf), _ = jax.lax.scan(body, init, jnp.arange(nfull))
    if rem:
        s, i, fl = scan_one(packed[nfull * seg:], min(klocal, rem))
        bs, bi, bf = merge(bs, bi, bf, s, i + nfull * seg, fl)
    return bs, bi, bf


@_functools.lru_cache(maxsize=64)
def _sharded_search_codes_fn(mesh: Mesh, n: int, shard_n: int,
                             klocal: int, k: int, r: int, bq: int,
                             tile: int, lut_dtype, interpret: bool,
                             pack: bool, keep: int):
    from jax import shard_map

    from rayuela_tpu.search.scan_codes_pallas import pallas_scan_codes_topk

    ndata = mesh.shape["data"]

    def local(T, packed):
        def scan_one(pseg, kseg):
            return pallas_scan_codes_topk(
                T, pseg, k=kseg, r=r, bq=bq, tile=tile, verify=True,
                interpret=interpret, lut_dtype=lut_dtype, pack=pack,
                keep=keep)

        d, i, fl = _scan_shard_segments(scan_one, packed, T.shape[2],
                                        klocal)
        shard = jax.lax.axis_index("data")
        i = i + shard * shard_n
        d = jnp.where(i < n, d, jnp.inf)
        if ndata == 1:                 # static: no merge needed
            kk = min(k, klocal)
            return d[:, :kk], i[:, :kk], fl
        dg = jax.lax.all_gather(d, "data", axis=1, tiled=True)
        ig = jax.lax.all_gather(i, "data", axis=1, tiled=True)
        neg, loc = jax.lax.top_k(-dg, min(k, ndata * klocal))
        fl = jax.lax.psum(fl.astype(jnp.int32), "data") > 0
        return -neg, jnp.take_along_axis(ig, loc, axis=1), fl

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P("data", None)),
                   out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_search_codes(mesh: Mesh, T: Array, packed: Array, *,
                         k: int, r: int | None = None,
                         bq: int | None = None, tile: int | None = None,
                         lut_dtype=None, interpret: bool = False,
                         pack: bool | None = None):
    """Multi-chip CODE-RESIDENT search: packed uint8 codes shard over
    ``data`` (each chip holds n/P * ~m bytes — a SIFT1B-class base at
    m=8 is ~1.1 GB/chip on an 8-chip slice; shards beyond the kernel's
    8.4M packed-id range segment in-shard with an exact merge,
    `_scan_shard_segments`), the per-query LUT stack
    replicates (m'·h·nq f32, tiny), each chip runs the code-resident
    kernel on its shard, and the (nq, k) partial lists merge with one
    all-gather + top-k. Same memory model as the reference's
    multi-worker LUT scan (`deps/src/linscan_aqd.cpp:55-61`), over ICI.

    ``T`` from `scan_codes_pallas.build_luts`, ``packed`` from
    `pack_codes`. Returns ``(scores, ids, flagged)``; scores exclude
    the +|q|^2 constant."""
    import jax.numpy as _jnp

    from rayuela_tpu.search.scan_codes_pallas import _codes_auto_config

    if lut_dtype is None:
        lut_dtype = _jnp.bfloat16
    ndata = mesh.shape["data"]
    Pp, n = pad_to_multiple(packed, ndata)
    shard_n = Pp.shape[0] // ndata
    # Mesh-pad rows unpack to code 0 with finite scores (the kernel only
    # masks rows past the SHARD's own padded n); they are dropped by the
    # i < n mask after the scan, so over-fetch by the pad count to keep
    # the merge exact even if they rank high.
    klocal = min(k + (Pp.shape[0] - n), shard_n)
    if pack is None:
        pack = not interpret
    ar, abq, atile, akeep, _, _ = _codes_auto_config(
        klocal, T.shape[2], pack, "lut")
    r = ar if r is None else r
    bq = abq if bq is None else bq
    tile = atile if tile is None else tile
    fn = _sharded_search_codes_fn(mesh, n, shard_n, klocal, k, r, bq,
                                  tile, lut_dtype, interpret, pack,
                                  akeep if pack else 0)
    return fn(T, Pp)


@_functools.lru_cache(maxsize=64)
def _sharded_search_codes_decode_fn(mesh: Mesh, n: int, shard_n: int,
                                    klocal: int, k: int, pq: bool,
                                    r: int, bq: int, tile: int,
                                    keep: int, op_dtype,
                                    interpret: bool, qsuper: int = 1):
    from jax import shard_map

    from rayuela_tpu.search.scan_codes_pallas import (
        pallas_scan_codes_decode_topk)

    ndata = mesh.shape["data"]

    def local(Q, Cf, nrm, packed):
        def scan_one(pseg, kseg):
            return pallas_scan_codes_decode_topk(
                Q, Cf, nrm, pseg, k=kseg, pq=pq, r=r, bq=bq,
                tile=tile, keep=keep, verify=True,
                interpret=interpret, op_dtype=op_dtype, qsuper=qsuper,
                vmem_mb=128 if qsuper > 1 else None)

        d, i, fl = _scan_shard_segments(scan_one, packed, Q.shape[0],
                                        klocal)
        shard = jax.lax.axis_index("data")
        i = i + shard * shard_n
        d = jnp.where(i < n, d, jnp.inf)
        if ndata == 1:                 # static: no merge needed
            kk = min(k, klocal)
            return d[:, :kk], i[:, :kk], fl
        dg = jax.lax.all_gather(d, "data", axis=1, tiled=True)
        ig = jax.lax.all_gather(i, "data", axis=1, tiled=True)
        neg, loc = jax.lax.top_k(-dg, min(k, ndata * klocal))
        fl = jax.lax.psum(fl.astype(jnp.int32), "data") > 0
        return -neg, jnp.take_along_axis(ig, loc, axis=1), fl

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P("data", None)),
                   out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_search_codes_decode(mesh: Mesh, Q: Array, C: Array,
                                packed: Array, *, k: int, pq: bool,
                                d: int | None = None,
                                norms_cbook: Array | None = None,
                                r: int | None = None,
                                bq: int | None = None,
                                tile: int | None = None,
                                keep: int | None = None,
                                op_dtype=None,
                                interpret: bool = False,
                                qsuper: int | None = None):
    """Multi-chip code-resident search with the IN-KERNEL-DECODE kernel
    (the default single-chip mode, 1.4-1.7x the LUT mode on hardware):
    packed codes shard over ``data``; queries, flattened codebooks and
    the norms table replicate (tiny); each chip decodes its tiles
    in-kernel and merges with one all-gather + top-k. Shards beyond
    the kernel's packed-id range (8.4M rows/call) segment in-shard
    with an exact `lax.scan` merge (`_scan_shard_segments`) — a
    SIFT1B-class base on an 8-chip slice (1.25e8 rows/chip) runs in
    15 segments per chip with no host round-trips.

    Returns ``(scores, ids, flagged)``; scores exclude +|q|^2."""
    import jax.numpy as _jnp

    from rayuela_tpu.search.scan_codes_pallas import (
        _codes_auto_config, build_decode_operands)

    if op_dtype is None:
        op_dtype = _jnp.bfloat16
    d = Q.shape[1] if d is None else d
    Cf, nrm = build_decode_operands(C, pq=pq, d=d,
                                    norms_cbook=norms_cbook,
                                    op_dtype=op_dtype)
    ndata = mesh.shape["data"]
    Pp, n = pad_to_multiple(packed, ndata)
    shard_n = Pp.shape[0] // ndata
    klocal = min(k + (Pp.shape[0] - n), shard_n)
    ar, abq, atile, akeep, _, aqsuper = _codes_auto_config(
        klocal, Q.shape[0], True, "decode")
    explicit = (r is not None or keep is not None or tile is not None
                or bq is not None)
    if qsuper is None:
        qsuper = 1 if (explicit or interpret) else aqsuper
    r = ar if r is None else r
    bq = abq if bq is None else bq
    tile = atile if tile is None else tile
    keep = akeep if keep is None else keep
    fn = _sharded_search_codes_decode_fn(mesh, n, shard_n, klocal, k,
                                         pq, r, bq, tile, keep,
                                         op_dtype, interpret, qsuper)
    return fn(Q, Cf, nrm, Pp)


def sharded_search_exact(mesh: Mesh, Xd: Array, x2: Array, Q: Array, *,
                         C: Array | None = None, B: Array | None = None,
                         pq: bool = False,
                         norm_term: Array | None = None,
                         k: int, **kw) -> tuple[Array, Array]:
    """`sharded_search` plus the single-chip contract: queries the
    certificate flags re-run through the exact XLA sharded scan
    (needs ``C``/``B`` to rebuild scores) or an exact decoded rescan
    over the gathered rows when codes are not provided. Returns
    ``(dists, ids)`` exact, always."""
    d, i, fl = sharded_search(mesh, Xd, x2, Q, k=k, **kw)
    flagged = np.asarray(fl)
    if flagged.any():
        qidx = np.nonzero(flagged)[0]
        Qf = jnp.asarray(Q)[qidx]
        if C is not None and B is not None:
            d2, i2 = sharded_scan_topk(mesh, Qf, C, B, k=k, pq=pq,
                                       norm_term=norm_term)
        else:
            from rayuela_tpu.search.linscan import exact_rescan
            d2, i2 = exact_rescan(Qf, Xd, x2, k=min(k, Xd.shape[0]))
        d = d.at[qidx].set(d2)
        i = i.at[qidx].set(i2)
    return d, i


@partial(jax.jit, static_argnames=("h",), donate_argnums=(1,))
def pq_lloyd_step_sharded(Xs: Array, centers: Array, h: int):
    """One data-parallel + model-parallel Lloyd step over all m subspace
    quantizers at once.

    ``Xs``: (m, n, ds) — n sharded over ``data``, m over ``model``.
    ``centers``: (m, h, ds) — m sharded over ``model``.

    The sufficient statistics (one-hot counts and sums) are sums over
    the sharded n axis, so GSPMD lowers the center update to local
    matmuls + `psum` over ICI — the TPU equivalent of the reference
    farming chunks to Julia workers (`src/codebook_update.jl:258-270`).
    """
    from rayuela_tpu.ops.kmeans import assign, update_centers

    def step(X, c):
        a, mind2 = assign(X, c)
        return update_centers(X, a, h, c, costs=mind2), jnp.sum(mind2)

    new_centers, obj = jax.vmap(step)(Xs, centers)
    return new_centers, jnp.sum(obj) / (Xs.shape[0] * Xs.shape[1])
