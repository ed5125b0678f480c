"""Profile the decoded-scan step at k=1000: how much of the end-to-end
time is the Pallas kernel vs the host-side candidate processing
(`_packed_candidates` lax.top_k over (nq, r*128) int32 keys)?

Writes progress lines unbuffered to stdout (run under `timeout`,
background, poll the raw file)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayuela_tpu.search import scan_pallas as sp

N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000


def log(msg):
    print(msg, flush=True)


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    jax.block_until_ready((C, B, Q))
    log("data ready")

    index = sp.build_index(C, B, pq=True, d=D)
    jax.block_until_ready(index.Xd)
    log(f"index built dtype={index.Xd.dtype}")

    for k in (1000, 100):
        r, bq, tile, keep, stage, premin = sp._auto_config(
            k, NQ, True, f32_index=index.Xd.dtype == jnp.float32)
        log(f"k={k}: config r={r} bq={bq} tile={tile} keep={keep}")

        # 1) full search (e2e)
        out = sp.search(index, Q, k)
        _ = np.asarray(out[0][0, :1])

        def call_full():
            out = sp.search(index, Q, k)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][0, 0])
        t_full = best_of(call_full)
        log(f"  e2e search: {t_full*1e3:.1f} ms = {NQ/t_full:.0f} qps")

        # 2) pallas_scan_topk jit (kernel + candidates, no host flag check)
        out = sp.pallas_scan_topk(Q, index.Xd, index.x2, k=k, r=r,
                                  bq=bq, tile=tile, pack=True, keep=keep)
        jax.block_until_ready(out)

        def call_topk():
            out = sp.pallas_scan_topk(Q, index.Xd, index.x2, k=k, r=r,
                                      bq=bq, tile=tile, pack=True,
                                      keep=keep)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][0, 0])
        t_topk = best_of(call_topk)
        log(f"  pallas_scan_topk: {t_topk*1e3:.1f} ms = {NQ/t_topk:.0f} qps")

        # 3) kernel only: same pallas_call, return raw outp (summed)
        nq, d = Q.shape
        n = index.Xd.shape[0]
        from rayuela_tpu.utils import cdiv
        LANES = sp.LANES
        rows = tile // LANES
        dp = cdiv(d, LANES) * LANES
        npad = cdiv(n, tile) * tile
        nqp = cdiv(nq, bq) * bq
        ntiles, nqb = npad // tile, nqp // bq
        idbits = sp._pack_idbits(True, npad)

        @jax.jit
        def kernel_only(Q, Xd, x2):
            QT = sp._pad2(Q, nqp, dp).astype(Xd.dtype).T
            Xp = sp._pad2(Xd, npad, dp)
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
            kern = functools.partial(
                sp._scan_kernel_packed, rows=rows, r=r, ntiles=ntiles,
                bq=bq, idbits=idbits, keep=keep)
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
            )(QT, Xp, x2p)
            return outp.sum()

        s = kernel_only(Q, index.Xd, index.x2)
        jax.block_until_ready(s)

        def call_kern():
            s = kernel_only(Q, index.Xd, index.x2)
            _ = np.asarray(s)
        t_kern = best_of(call_kern)
        log(f"  kernel only: {t_kern*1e3:.1f} ms = {NQ/t_kern:.0f} qps")

        # 4) candidate processing only, on a precomputed outp
        outp = None

        @jax.jit
        def kernel_raw(Q, Xd, x2):
            QT = sp._pad2(Q, nqp, dp).astype(Xd.dtype).T
            Xp = sp._pad2(Xd, npad, dp)
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
            kern = functools.partial(
                sp._scan_kernel_packed, rows=rows, r=r, ntiles=ntiles,
                bq=bq, idbits=idbits, keep=keep)
            return pl.pallas_call(
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
            )(QT, Xp, x2p)

        outp = kernel_raw(Q, index.Xd, index.x2)
        jax.block_until_ready(outp)
        q2 = jnp.sum(Q * Q, axis=-1, keepdims=True)

        @jax.jit
        def cands_only(outp, q2):
            vals, ids, tau_k = sp._packed_candidates(
                outp[:r], NQ, r, k, idbits)
            dists = vals + q2
            flagged = jnp.any(outp[r, :, :NQ] < tau_k[None, :], axis=0)
            return dists, ids, flagged

        o = cands_only(outp, q2)
        jax.block_until_ready(o)

        def call_cands():
            o = cands_only(outp, q2)
            jax.block_until_ready(o)
            _ = np.asarray(o[0][0, 0])
        t_cands = best_of(call_cands)
        log(f"  candidates only: {t_cands*1e3:.1f} ms")

        # 5) which part of cands? pure top_k over the keys
        keys = outp[:r, :, :NQ].reshape(r * LANES, NQ).T
        keys = jax.device_put(keys)
        jax.block_until_ready(keys)

        @jax.jit
        def topk_only(keys):
            neg, loc = lax.top_k(-keys, k)
            return neg, loc

        o = topk_only(keys)
        jax.block_until_ready(o)

        def call_tk():
            o = topk_only(keys)
            jax.block_until_ready(o)
            _ = np.asarray(o[0][0, 0])
        t_tk = best_of(call_tk)
        log(f"  lax.top_k only: {t_tk*1e3:.1f} ms")

        # 6) alternative: full sort
        @jax.jit
        def sort_only(keys):
            sk = lax.sort(keys, dimension=1)
            return sk[:, :k]

        o = sort_only(keys)
        jax.block_until_ready(o)
        t_st = best_of(lambda: (jax.block_until_ready(sort_only(keys)),
                                None)[1] or np.asarray(0))
        log(f"  lax.sort only: {t_st*1e3:.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
