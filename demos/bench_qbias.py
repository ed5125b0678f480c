"""Interleaved on-chip A/B for the qbias non-negative-score mode.

qbias feeds per-query |q|^2 into the packed decoded-scan kernels so
scores are non-negative and the signed sortable-key transform
(compare+xor+select per element) becomes a plain bitcast — the last
key-side op per NEXT.md's selection-floor analysis.

Run standalone: timeout 3600 python demos/bench_qbias.py /tmp/qbias.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qbias.log"
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

    def run(k, qbias):
        # search() hard-syncs internally via the certificate-flags
        # host pull — its bare wall time IS e2e latency (BASELINE.md)
        t0 = time.perf_counter()
        dists, ids = search(index, Q, k, qbias=qbias)
        dt = time.perf_counter() - t0
        return dt, np.asarray(ids)

    for k in (1000, 100):
        # warm both compiles first
        _, ids_off = run(k, False)
        _, ids_on = run(k, True)
        ident = bool((ids_off == ids_on).all())
        log(f"k={k}: ids identical qbias on/off: {ident}")
        if not ident:
            nm = int((ids_off != ids_on).sum())
            log(f"  MISMATCH count {nm} / {ids_off.size}")
        best = {False: 1e9, True: 1e9}
        for rep in range(4):
            for qb in (False, True):
                dt, _ = run(k, qb)
                best[qb] = min(best[qb], dt)
                log(f"  k={k} qbias={qb} rep{rep}: {dt*1000:.1f} ms "
                    f"({NQ/dt:.0f} qps)")
        qps_off, qps_on = NQ / best[False], NQ / best[True]
        log(f"k={k} BEST: off {qps_off:.0f} qps / on {qps_on:.0f} qps "
            f"-> qbias {'+' if qps_on > qps_off else ''}"
            f"{(qps_on/qps_off-1)*100:.1f}%")


if __name__ == "__main__":
    main()
