"""TPU config sweep for the code-resident scan.

Run: timeout 3500 python demos/bench_codes_tune.py /tmp/ctune.log '[[k,r,bq,tile,pack],...]'
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ctune.log"
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

    from rayuela_tpu.search.scan_codes_pallas import (build_luts,
                                                      pack_codes,
                                                      pallas_scan_codes_topk)

    log("devices:", jax.devices())
    N, D, M, H, NQ = 1_000_000, 128, 8, 256, 2000
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    T = build_luts(C, Q, pq=True, d=D)
    P = pack_codes(B)
    jax.block_until_ready((T, P))
    log("luts+codes ready")

    configs = json.loads(sys.argv[2]) if len(sys.argv) > 2 else [
        (1000, 48, 128, 2048, True),
        (100, 16, 128, 2048, True),
    ]
    for k, r, bq, tile, pack in configs:
        tag = f"k={k} r={r} bq={bq} tile={tile} pack={pack}"
        try:
            t0 = time.perf_counter()
            out = pallas_scan_codes_topk(T, P, k=k, r=r, bq=bq,
                                         tile=tile, verify=True,
                                         pack=pack)
            _ = np.asarray(out[0][0, :1])
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _i in range(reps):
                out = pallas_scan_codes_topk(T, P, k=k, r=r, bq=bq,
                                             tile=tile, verify=True,
                                             pack=pack)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][0, 0])
            dt = (time.perf_counter() - t0) / reps
            fl = int(np.asarray(out[2]).sum())
            log(f"{tag}: {NQ/dt:.0f} qps (compile {tc:.0f}s, "
                f"flagged {fl}/{NQ})")
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:150]}")
    log("DONE")


if __name__ == "__main__":
    main()
