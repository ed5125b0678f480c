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
    index16 = build_index(C, B, pq=True, d=D, dtype=jnp.bfloat16)
    jax.block_until_ready((index.Xd, index16.Xd))
    log("index ready")

    # (k, r, bq, tile, pack)
    import json
    configs = json.loads(sys.argv[2]) if len(sys.argv) > 2 else [
        (1000, 48, 128, 2048, False),   # round-1 baseline config
        (1000, 48, 128, 2048, True),
        (1000, 32, 128, 4096, True),
        (100, 16, 128, 2048, False),
        (100, 16, 512, 2048, True),
    ]
    for cfg in configs:
        k, r, bq, tile, pack = cfg[:5]
        idx = index16 if (len(cfg) > 5 and cfg[5]) else index
        tag = (f"k={k} r={r} bq={bq} tile={tile} pack={pack}"
               + (" bf16x" if idx is index16 else ""))
        try:
            t0 = time.perf_counter()
            out = pallas_scan_topk(Q, idx.Xd, idx.x2, k=k, r=r,
                                   bq=bq, tile=tile, verify=True,
                                   pack=pack)
            _ = np.asarray(out[0][0, :1])
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _i in range(reps):
                out = pallas_scan_topk(Q, idx.Xd, idx.x2, k=k, r=r,
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
