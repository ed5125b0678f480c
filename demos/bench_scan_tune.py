"""TPU config sweep for the fused decoded scan (pack32).

Run standalone: timeout 3600 python demos/bench_scan_tune.py /tmp/tune.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tune.log"
_log = open(LOG, "w")


def log(*a):
    print(*a, file=_log, flush=True)
    print(*a, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from rayuela_tpu.search.scan_pallas import (build_index,
                                                pallas_scan_topk)

    log("devices:", jax.devices())
    N, D, M, H, NQ = 1_000_000, 128, 8, 256, 2000
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    index = build_index(C, B, pq=True, d=D)
    jax.block_until_ready(index.Xd)
    log("index ready")

    # (k, r, bq, tile, pack)
    configs = [
        (1000, 48, 128, 2048, False),   # round-1 baseline config
        (1000, 48, 128, 2048, True),
        (1000, 48, 256, 2048, True),
        (1000, 32, 128, 4096, True),
        (1000, 112, 128, 2048, True),
        (100, 16, 128, 2048, False),
        (100, 16, 128, 2048, True),
        (100, 16, 256, 2048, True),
        (100, 16, 512, 2048, True),
        (100, 32, 128, 4096, True),
        (100, 8, 128, 1024, True),
    ]
    for k, r, bq, tile, pack in configs:
        tag = f"k={k} r={r} bq={bq} tile={tile} pack={pack}"
        try:
            t0 = time.perf_counter()
            out = pallas_scan_topk(Q, index.Xd, index.x2, k=k, r=r,
                                   bq=bq, tile=tile, verify=True,
                                   pack=pack)
            _ = np.asarray(out[0][0, :1])
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _i in range(reps):
                out = pallas_scan_topk(Q, index.Xd, index.x2, k=k, r=r,
                                       bq=bq, tile=tile, verify=True,
                                       pack=pack)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][0, :1])
            dt = (time.perf_counter() - t0) / reps
            fl = int(np.asarray(out[2]).sum())
            log(f"{tag}: {NQ/dt:.0f} qps (compile {tc:.0f}s, "
                f"flagged {fl}/{NQ})")
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
    log("DONE")


if __name__ == "__main__":
    main()
