"""Bench the Pallas tail-merge kernel vs the XLA candidate path on the
real TPU: e2e search() time at k=1000 and k=100, SIFT1M shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import functools
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rayuela_tpu.search import scan_pallas as sp

N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000

def log(m):
    print(m, flush=True)

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
    index = sp.build_index(C, B, pq=True, d=D)
    jax.block_until_ready(index.Xd)
    log(f"index ready dtype={index.Xd.dtype}")

    for k in (1000, 100):
        r, bq, tile, keep, stage, premin = sp._auto_config(
            k, NQ, True, f32_index=index.Xd.dtype == jnp.float32)
        log(f"k={k}: r={r} bq={bq} tile={tile} keep={keep}")
        for tailmode in (True, False):
            t0 = time.perf_counter()
            d_, i_, fl = sp.pallas_scan_topk(
                Q, index.Xd, index.x2, k=k, r=r, bq=bq, tile=tile,
                pack=True, keep=keep, tail=tailmode)
            jax.block_until_ready((d_, i_, fl))
            log(f"  tail={tailmode}: compile+run {time.perf_counter()-t0:.1f}s, "
                f"flags={int(np.asarray(fl).sum())}")
            def call():
                o = sp.pallas_scan_topk(
                    Q, index.Xd, index.x2, k=k, r=r, bq=bq, tile=tile,
                    pack=True, keep=keep, tail=tailmode)
                jax.block_until_ready(o)
                _ = np.asarray(o[0][0, 0])
            t = best_of(call)
            log(f"  tail={tailmode}: {t*1e3:.1f} ms = {NQ/t:.0f} qps")
        # cross-check equality tail vs xla on a slice
        a = sp.pallas_scan_topk(Q[:256], index.Xd, index.x2, k=k, r=r,
                                bq=bq, tile=tile, pack=True, keep=keep,
                                tail=True)
        b = sp.pallas_scan_topk(Q[:256], index.Xd, index.x2, k=k, r=r,
                                bq=bq, tile=tile, pack=True, keep=keep,
                                tail=False)
        eq_i = np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
        eq_d = np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        log(f"  tail-vs-xla equal on 256q: ids={eq_i} dists={eq_d}")
    log("done")

if __name__ == "__main__":
    main()
