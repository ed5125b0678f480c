"""Round 2: keep=8 variants at tile=8192 (kill per-(lane,tile) keep
overflows) + e2e search() timing for the winner."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rayuela_tpu.search import scan_pallas as sp

N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000

def log(m): print(m, flush=True)

def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn()
        best = min(best, time.perf_counter() - t0)
    return best

def main():
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    index = sp.build_index(C, B, pq=True, d=D)
    jax.block_until_ready(index.Xd)
    cfgs = {
        1000: [(24, 256, 8192, 8, 64), (24, 512, 8192, 8, 64),
               (28, 512, 8192, 4, 64)],
        100: [(8, 512, 8192, 8, 64), (8, 256, 8192, 8, 64),
              (14, 512, 8192, 2, 64)],
    }
    for k, lst in cfgs.items():
        log(f"== k={k}")
        for r, bq, tile, keep, vm in lst:
            try:
                o = sp.pallas_scan_topk(Q, index.Xd, index.x2, k=k, r=r,
                                        bq=bq, tile=tile, pack=True,
                                        keep=keep, vmem_mb=vm)
                jax.block_until_ready(o)
                fl = int(np.asarray(o[2]).sum())
            except Exception as e:
                log(f"  r={r} bq={bq} t={tile} k={keep}: FAIL "
                    f"{type(e).__name__}: {str(e)[:80]}")
                continue
            def call():
                o = sp.pallas_scan_topk(Q, index.Xd, index.x2, k=k, r=r,
                                        bq=bq, tile=tile, pack=True,
                                        keep=keep, vmem_mb=vm)
                jax.block_until_ready(o)
                _ = np.asarray(o[0][0, 0])
            t = best_of(call)
            log(f"  r={r} bq={bq} t={tile} keep={keep}: {t*1e3:.1f} ms "
                f"= {NQ/t:.0f} qps (fl={fl})")
            # e2e with flag-rescan through search()
            def call_e2e():
                o = sp.search(index, Q, k, r=r, bq=bq, tile=tile, keep=keep)
                jax.block_until_ready(o)
                _ = np.asarray(o[0][0, 0])
            sp.search(index, Q, k, r=r, bq=bq, tile=tile, keep=keep)
            te = best_of(call_e2e)
            log(f"    e2e search: {te*1e3:.1f} ms = {NQ/te:.0f} qps")
    log("done")

if __name__ == "__main__":
    main()
