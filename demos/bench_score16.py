"""Interleaved on-chip A/B for the score16 bf16-score mode.

score16 makes the distance block leave the MXU as bf16 and forms the
packed key from its sign-fixed 16 bits (`scan_pallas._row_key16`) —
halving the VMEM traffic of the f32 score block that NEXT.md's roof
decomposition measured as 67% of decoded-scan kernel time. This is the
"smaller score dtype end-to-end" floor lever, the one untried item of
VERDICT r3 #1. Reports per-k interleaved best-of-N e2e through
search(), flag counts (bf16 tie-bucket inflation would surface as
certificate flags), and top-k set overlap vs the f32-key kernel.

Run standalone: timeout 3600 python demos/bench_score16.py /tmp/s16.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s16.log"
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

    from rayuela_tpu.search.scan_pallas import build_index, search

    log("devices:", jax.devices())
    N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    index = build_index(C, B, pq=True, d=D, dtype=jnp.bfloat16)
    jax.block_until_ready(index.Xd)
    log("index ready (bf16 decoded)")

    def run(k, s16):
        # search() hard-syncs internally via the certificate-flags
        # host pull — its bare wall time IS e2e latency (BASELINE.md)
        t0 = time.perf_counter()
        dists, ids = search(index, Q, k, score16=s16)
        dt = time.perf_counter() - t0
        return dt, np.asarray(ids)

    for k in (1000, 100):
        _, ids_off = run(k, False)           # warm both compiles
        _, ids_on = run(k, True)
        overlap = np.mean([
            len(set(ids_off[q]) & set(ids_on[q])) / k
            for q in range(0, NQ, 97)])
        log(f"k={k}: top-k set overlap f32-key vs score16: "
            f"{overlap:.4f}")
        best = {False: 1e9, True: 1e9}
        for rep in range(4):
            for s16 in (False, True):
                dt, _ = run(k, s16)
                best[s16] = min(best[s16], dt)
                log(f"  k={k} score16={s16} rep{rep}: {dt*1000:.1f} ms "
                    f"({NQ/dt:.0f} qps)")
        qps_off, qps_on = NQ / best[False], NQ / best[True]
        log(f"k={k} BEST: off {qps_off:.0f} qps / on {qps_on:.0f} qps "
            f"-> score16 {'+' if qps_on > qps_off else ''}"
            f"{(qps_on/qps_off-1)*100:.1f}%")


if __name__ == "__main__":
    main()
