"""TPU bench: code-resident Pallas scan at SIFT1M shape.

Run standalone (one TPU process at a time):
    timeout 3600 python demos/bench_codes_scan.py /tmp/codes_bench.log
Writes progress lines (flushed) to the log file.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/codes_bench.log"
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

    from rayuela_tpu.search.scan_codes_pallas import (
        build_codes_index, build_luts, pack_codes, pallas_scan_codes_topk,
        search_codes, xla_lut_scan)

    log("devices:", jax.devices())
    N, D, M, H = 1_000_000, 128, 8, 256
    NQ, KNN, QCHUNK = 10_000, 1000, 2000

    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    jax.block_until_ready((C, B, Q))
    log("data ready")

    idx = build_codes_index(C, B, pq=True, d=D)
    jax.block_until_ready(idx.packed)
    log("packed index:", idx.packed.shape, idx.packed.dtype,
        f"{idx.packed.size * 4 / 1e6:.1f} MB")

    # correctness on-chip, small slice, f32 tables vs XLA oracle
    t0 = time.perf_counter()
    Ts = build_luts(C, Q[:16], pq=True, d=D)
    sc, ids, flagged = pallas_scan_codes_topk(
        Ts, idx.packed, k=100, r=16, bq=128, tile=2048,
        lut_dtype=jnp.float32)
    _ = np.asarray(sc[0, :1])
    log(f"f32 compile+run {time.perf_counter()-t0:.1f}s; "
        f"flagged={int(np.asarray(flagged).sum())}")
    ref_s, ref_i = xla_lut_scan(Ts, B, 100)
    es = np.abs(np.asarray(sc) - np.asarray(ref_s)).max()
    match = (np.asarray(ids) == np.asarray(ref_i)).mean()
    log(f"on-chip f32 vs oracle: max|ds|={es:.2e} id-match={match:.4f}")
    assert es < 1e-2

    # bf16 tables: kernel must agree with the bf16-table oracle
    sc16, ids16, fl16 = pallas_scan_codes_topk(
        Ts, idx.packed, k=100, r=16, bq=128, tile=2048,
        lut_dtype=jnp.bfloat16)
    ref16, _ = xla_lut_scan(Ts, B, 100, lut_dtype=jnp.bfloat16)
    e16 = np.abs(np.asarray(sc16) - np.asarray(ref16)).max()
    log(f"on-chip bf16 vs bf16 oracle: max|ds|={e16:.2e} "
        f"flagged={int(np.asarray(fl16).sum())}")
    assert e16 < 1e-2

    # bf16 warm-up + compile at bench config
    for (label, dt_) in (("bf16", jnp.bfloat16), ):
        t0 = time.perf_counter()
        dv, di = search_codes(idx, Q[:QCHUNK], KNN, lut_dtype=dt_)
        _ = np.asarray(dv[0, :1])
        log(f"{label} compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        outs = [search_codes(idx, Q[s:s + QCHUNK], KNN, lut_dtype=dt_)
                for s in range(0, NQ, QCHUNK)]
        jax.block_until_ready(outs)
        _ = np.asarray(outs[-1][0][0, 0])
        dt = time.perf_counter() - t0
        log(f"{label} codes-scan qps (knn=1000): {NQ/dt:.1f}")

    # knn=100 config (r=16 auto)
    t0 = time.perf_counter()
    dv, di = search_codes(idx, Q[:QCHUNK], 100)
    _ = np.asarray(dv[0, :1])
    log(f"knn=100 compile+first {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    outs = [search_codes(idx, Q[s:s + QCHUNK], 100)
            for s in range(0, NQ, QCHUNK)]
    jax.block_until_ready(outs)
    _ = np.asarray(outs[-1][0][0, 0])
    dt = time.perf_counter() - t0
    log(f"bf16 codes-scan qps (knn=100): {NQ/dt:.1f}")
    log("DONE")


if __name__ == "__main__":
    main()
