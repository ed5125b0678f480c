"""Headline benchmarks: SIFT1M-protocol scan + encode on one TPU chip.

Emits one JSON line per metric: ``{"metric", "value", "unit",
"vs_baseline", "spread"}``. ``spread`` is max/min wall-clock over the
timing reps — the axon tunnel injects erratic multi-hundred-ms stalls,
so any single-number metric needs its dispersion recorded (a spread
near 1.0 means the number is steady-state; large spreads mean tunnel
noise, trust the dedicated benches). Every RATIO metric (vs this
repo's own XLA formulation) interleaves the two implementations
rep-by-rep so tunnel drift cancels (VERDICT r2 item 4).

* ``adc_scan_qps_sift1m_m8_knn1000`` / ``..._knn100`` — the deployment
  hot path (reference `src/Linscan.jl:5-26` →
  `deps/src/linscan_aqd.cpp:37-102`): n=1e6 base, m=8, h=256, d=128,
  nquery=1e4 — the exact SIFT1M 64-bit protocol of
  `demos/demos_train_query_base.jl:15-19`. Fused Pallas scan over the
  decoded index, verification included (exact for bf16-rounded scores).
  vs_baseline divides by a documented ~2,000 qps estimate of the
  reference's 16-core OpenMP scan (no number is published in-repo).
* ``codes_scan_qps_sift1m_m{8,16}_knn{1000,100}`` — same protocol on
  the CODE-RESIDENT index (`search/scan_codes_pallas`): ~8/16 MB of
  packed codes on chip instead of a 512 MB decode; this is the
  apples-to-apples memory model vs the reference's LUT scan, at both
  the 64-bit and 128-bit code sizes.
* ``icm_encode_vps_m8`` / ``_m16`` — LSQ-family ILS/ICM encode
  (ilsiter=8, icmiter=4, npert=4; reference
  `demos/demos_train_query_base.jl:64-67`) in vectors/s on the Pallas
  running-sum kernel; vs_baseline is the interleaved in-run speedup
  over this repo's XLA one-hot formulation.
* ``viterbi_encode_vps_m8`` — ChainQ exact Viterbi encode (reference
  C++/CUDA kernels `deps/src/encode_icm.cpp:63-152`,
  `cudautils.cu:198-291`) on the Pallas kernel; vs_baseline is the
  interleaved in-run speedup over the batched XLA min-plus path.
* ``codes_scan_qps_100m_m8_knn1000`` — SIFT100M-scale: n=1e8 codes
  (800 MB packed) resident on one chip, segmented code-resident scan;
  vs_baseline scales the reference estimate by base size.
* ``codes_scan_qps_1b_m8_knn100`` — SIFT1B-scale: n=1e9 codes (8 GB
  packed, the WHOLE base chip-resident), 120 exact-merged segments;
  same scaled baseline. Skipped when the bench is near its time
  budget (set ``RAYUELA_BENCH_1B=0`` to skip explicitly).
* ``sharded_scan_qps_1dev_knn1000`` — the decoded scan through the
  `parallel.mesh` sharded wrapper on a ONE-device mesh; vs_baseline is
  the interleaved ratio to the direct `search()` (>= ~1.0 shows the
  multi-chip wrapper adds no single-chip overhead — the scaling
  starting point).
* ``codes_scan_qps_streamed_2e8_knn100`` — the beyond-HBM rung
  (reference ``nsplits``, `src/LSQ_GPU.jl:218-264`): n=2e8 packed
  codes living in HOST memory, streamed shard-by-shard (2 x 1e8)
  through `search_codes_streamed` with an exact host-side merge.
  Deliberately transfer-bound — the number is the end-to-end
  throughput of the deployment path for bases bigger than the chip,
  host->HBM PCIe/tunnel time included. Runs LAST (after the 1b row:
  one rep is ~40 s of pure transfer) and degrades to 1 rep / skips
  near the time budget.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SCAN_BASELINE_QPS = 2000.0  # documented estimate; see module docstring

N, D, M, H = 1_000_000, 128, 8, 256
NQ, KNN = 10_000, 1000
N_ENC = 200_000
START = time.monotonic()
# Whole-bench wall-clock budget. The driver kills the bench at ITS
# budget (r03 died at rc=124 with the 1e8/1e9 rows unemitted), so the
# bench must degrade gracefully inside a budget of its own: the 1e8
# row runs EARLY (right after the m8 codes rows), later sections drop
# to reps=1 when behind, the 1e9 row runs only if enough budget
# remains, and the streamed row (1.6 GB host->HBM per rep) runs LAST.
# default 780 s: the r03 driver kill happened somewhere past the 10th
# row — staying clearly under the driver's own (unpublished) budget
# means WE decide what to skip, not SIGKILL
TIME_BUDGET = float(os.environ.get("RAYUELA_BENCH_BUDGET", 780))


def _remaining() -> float:
    return TIME_BUDGET - (time.monotonic() - START)


def _reps(default: int = 3) -> int:
    """Adaptive rep count: full best-of-N when on schedule, 1 when the
    budget is nearly spent (a 1-rep row beats a missing row)."""
    r = _remaining()
    return default if r > 240 else (2 if r > 120 else 1)


def _mark(section: str):
    print(f"# t={time.monotonic() - START:.0f}s {section}", flush=True)


def _sync(x):
    """Hard host sync WITHOUT pulling the full result through the axon
    tunnel: block, then fetch one element (block_until_ready alone
    under-measures on this backend; a full np.asarray of a (2e5, m)
    codes array adds ~150 ms of pure tunnel transfer to every rep)."""
    import jax
    jax.block_until_ready(x)
    a = x[0] if isinstance(x, (tuple, list)) else x
    while a.ndim:
        a = a[0]
    return np.asarray(a)


def _timed(fn, reps: int | None = None) -> tuple[float, float]:
    """(best, spread=max/min) wall-clock over ``reps`` calls (each
    fn() must block until its result is on host). The minimum is the
    steady-state time; the spread records tunnel noise."""
    if reps is None:
        reps = _reps()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), max(ts) / min(ts)


def _timed_interleaved(fn_a, fn_b, reps: int | None = None):
    """Interleave two implementations rep-by-rep so tunnel drift
    affects both equally → (best_a, best_b, spread_a)."""
    if reps is None:
        reps = _reps()
    ta, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn_a()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn_b()
        tb.append(time.perf_counter() - t0)
    return min(ta), min(tb), max(ta) / min(ta)


def emit(metric, value, unit, vs, spread=None):
    rec = {"metric": metric, "value": round(value, 1), "unit": unit,
           "vs_baseline": round(vs, 3)}
    if spread is not None:
        rec["spread"] = round(spread, 3)
    print(json.dumps(rec), flush=True)


def bench_scan(jax, jnp, rng, C, B, Q):
    from rayuela_tpu.search.scan_pallas import build_index, search

    index = build_index(C, B, pq=True, d=D)
    jax.block_until_ready(index.Xd)

    # search() hard-syncs internally (the exactness-certificate flags
    # are pulled to host to decide the rescan), so its wall time IS
    # the end-to-end latency. An extra block_until_ready + scalar
    # fetch after it adds two more axon-tunnel RPCs (~100 ms/call,
    # 2026-08-18 profile) and under-reports qps 30-50%.
    do_search, needs_sync = search, False
    try:
        out = do_search(index, Q[:2000], KNN)
        _ = np.asarray(out[0][0, :1])
    except Exception as e:
        print(f"# pallas path unavailable ({type(e).__name__}); "
              "falling back to XLA scan", flush=True)
        from rayuela_tpu.search.linscan import exact_rescan

        def do_search(idx, q, k):
            return exact_rescan(q, idx.Xd, idx.x2, k)
        needs_sync = True
        out = do_search(index, Q[:2000], KNN)
        _ = np.asarray(out[0][0, :1])

    for knn, name in ((KNN, "adc_scan_qps_sift1m_m8_knn1000"),
                      (100, "adc_scan_qps_sift1m_m8_knn100")):
        out = do_search(index, Q, knn)                # compile/warm
        _ = np.asarray(out[0][0, :1])

        def call(knn=knn):
            out = do_search(index, Q, knn)
            if needs_sync:
                jax.block_until_ready(out)
                _ = np.asarray(out[0][0, 0])
        dt, spread = _timed(call)
        qps = NQ / dt
        emit(name, qps, "queries/s", qps / SCAN_BASELINE_QPS, spread)
    return index


def bench_sharded(jax, jnp, index, Q):
    """1-device-mesh sharded wrapper vs direct search, interleaved —
    the claim the round-2 BASELINE carried only as prose."""
    try:
        from rayuela_tpu.parallel.mesh import make_mesh, sharded_search
        from rayuela_tpu.search.scan_pallas import search

        mesh = make_mesh(1, 1, devices=jax.devices()[:1])
        out = sharded_search(mesh, index.Xd, index.x2, Q, k=KNN)
        _ = np.asarray(out[0][0, :1])                 # compile/warm
        out = search(index, Q, KNN)
        _ = np.asarray(out[0][0, :1])

        def call_sh():
            out = sharded_search(mesh, index.Xd, index.x2, Q, k=KNN)
            _ = np.asarray(out[0][0, :1])

        def call_direct():
            search(index, Q, KNN)                     # internal sync

        t_sh, t_dir, spread = _timed_interleaved(call_sh, call_direct)
        qps = NQ / t_sh
        emit("sharded_scan_qps_1dev_knn1000", qps, "queries/s",
             (NQ / t_sh) / (NQ / t_dir), spread)
    except Exception as e:
        print(f"# sharded 1-dev row unavailable ({type(e).__name__}: "
              f"{e})", flush=True)


def bench_scan_codes(jax, jnp, rng, C, B, Q, ms=(8, 16)):
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)

    cfgs = []
    if 8 in ms:
        cfgs.append((M, C, B))
    if 16 in ms:
        C16 = jnp.asarray(rng.standard_normal((16, H, D // 16)),
                          jnp.float32)
        B16 = jnp.asarray(rng.integers(0, H, size=(N, 16)), jnp.int32)
        cfgs.append((16, C16, B16))
    for m, Cm, Bm in cfgs:
        idx = build_codes_index(Cm, Bm, pq=True, d=D)
        jax.block_until_ready(idx.packed)
        try:
            out = search_codes(idx, Q, KNN)
            _ = np.asarray(out[0][0, :1])
        except Exception as e:
            print(f"# codes-resident path m={m} unavailable "
                  f"({type(e).__name__}: {e})", flush=True)
            continue

        for knn in (KNN, 100):
            out = search_codes(idx, Q, knn)               # compile/warm
            _ = np.asarray(out[0][0, :1])

            # search_codes hard-syncs internally (flags pull)
            def call(idx=idx, knn=knn):
                search_codes(idx, Q, knn)
            dt, spread = _timed(call)
            qps = NQ / dt
            emit(f"codes_scan_qps_sift1m_m{m}_knn{knn}", qps,
                 "queries/s", qps / SCAN_BASELINE_QPS, spread)
        del idx


def bench_encode(jax, jnp, rng):
    from rayuela_tpu.ops.icm import encoding_icm

    key = jax.random.PRNGKey(0)
    X = jnp.asarray(rng.standard_normal((N_ENC, D)), jnp.float32)
    for m in (8, 16):
        C = jnp.asarray(rng.standard_normal((m, H, D)) * 0.2,
                        jnp.float32)
        B0 = jnp.asarray(rng.integers(0, H, size=(N_ENC, m)), jnp.int32)
        jax.block_until_ready((X, C, B0))
        kw = dict(ilsiter=8, icmiter=4, npert=4, randord=True)
        nx = 50_000                    # XLA slice for the in-run ratio

        try:
            _sync(encoding_icm(key, X, C, B0, impl="pallas", **kw))
        except Exception as e:
            print(f"# pallas encode m={m} unavailable "
                  f"({type(e).__name__}: {e})", flush=True)
            continue
        _sync(encoding_icm(key, X[:nx], C, B0[:nx], impl="xla", **kw))

        t_p, t_x, spread = _timed_interleaved(
            lambda: _sync(encoding_icm(key, X, C, B0, impl="pallas",
                                       **kw)),
            lambda: _sync(encoding_icm(key, X[:nx], C, B0[:nx],
                                       impl="xla", **kw)))
        vps = N_ENC / t_p
        emit(f"icm_encode_vps_m{m}", vps, "vectors/s",
             vps / (nx / t_x), spread)


def bench_viterbi(jax, jnp, rng):
    from rayuela_tpu.ops.viterbi import viterbi_encode

    n_vit = 100_000
    X = jnp.asarray(rng.standard_normal((n_vit, D)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((M, H, D)) * 0.2, jnp.float32)
    jax.block_until_ready((X, C))
    try:
        _sync(viterbi_encode(X, C, impl="pallas"))
    except Exception as e:
        print(f"# pallas viterbi unavailable ({type(e).__name__}: {e})",
              flush=True)
        return
    _sync(viterbi_encode(X, C, impl="xla"))
    t_p, t_x, spread = _timed_interleaved(
        lambda: _sync(viterbi_encode(X, C, impl="pallas")),
        lambda: _sync(viterbi_encode(X, C, impl="xla")), reps=_reps(4))
    vps = n_vit / t_p
    emit("viterbi_encode_vps_m8", vps, "vectors/s", vps / (n_vit / t_x),
         spread)


def _random_packed_codes(jax, jnp, rng, n_big):
    """Random packed codes generated ON-DEVICE: uniform random bytes
    ARE uniform random codes at h=256, and the packed (n, m/4) int32
    layout is just those bytes — so threefry bits straight into HBM.
    The old host path (chunked rng.bytes + device_put) cost ~150 s for
    the 8 GB 1e9 array through the axon tunnel and was why the 1b row
    kept missing the time budget; on-device it's seconds. Filled in 16
    row-segments via donated dynamic_update_slice so peak HBM is the
    8 GB buffer + one 0.5 GB segment, not 2x."""
    from functools import partial

    from jax import lax

    nseg = 16 if n_big % 16 == 0 else 1
    rows = n_big // nseg

    @partial(jax.jit, donate_argnums=0)
    def fill(buf, key):
        def body(i, b):
            bits = jax.random.bits(jax.random.fold_in(key, i),
                                   (rows, M // 4), jnp.uint32)
            seg = lax.bitcast_convert_type(bits, jnp.int32)
            return lax.dynamic_update_slice(b, seg, (i * rows, 0))
        return lax.fori_loop(0, nseg, body, buf)

    packed = fill(jnp.zeros((n_big, M // 4), jnp.int32),
                  jax.random.PRNGKey(int(rng.integers(1 << 30))))
    jax.block_until_ready(packed)
    return packed


def bench_scan_100m(jax, jnp, rng, C, Q):
    """SIFT100M-scale code-resident scan: n=1e8 codes (800 MB packed)
    resident on ONE chip — the decoded base would be 51 GB. Runs the
    segmented in-kernel-decode path (12 exact-merged segments);
    vs_baseline is vs the same ~2k-qps reference estimate scaled by
    base size (the reference CPU scan is linear in n)."""
    from rayuela_tpu.search.scan_codes_pallas import (CodesIndex,
                                                      search_codes)

    n_big, nq_big = 100_000_000, 1_000
    try:
        packed = _random_packed_codes(jax, jnp, rng, n_big)
        idx = CodesIndex(packed, M, C, pq=True, d=D, norms_cbook=None)
        Qb = Q[:nq_big]
        out = search_codes(idx, Qb, KNN)
        _ = np.asarray(out[0][0, :1])

        def call():
            search_codes(idx, Qb, KNN)   # internal flags-pull sync
        dt, spread = _timed(call)
        qps = nq_big / dt
        base = SCAN_BASELINE_QPS * N / n_big
        emit("codes_scan_qps_100m_m8_knn1000", qps, "queries/s",
             qps / base, spread)
        del idx, packed
    except Exception as e:
        print(f"# 100m codes scan unavailable ({type(e).__name__}: "
              f"{e})", flush=True)


def bench_scan_streamed(jax, jnp, rng, C, Q):
    """Beyond-HBM streamed scan: n=2e8 packed codes (1.6 GB) in HOST
    memory, 2 equal 1e8 shards streamed through the chip per call —
    the one (decoded|codes|LUT) x (single|sharded|streamed) scan cell
    that had no hardware number (VERDICT r4 #4)."""
    from rayuela_tpu.search.scan_codes_pallas import search_codes_streamed

    # Worst-case cost from here: ~20 s host codegen + ~50 s
    # compile/warm (one 1.6 GB host->HBM stream) + one ~45 s rep.
    # 120 s entry budget keeps the 1-rep path inside TIME_BUDGET on a
    # slow tunnel (r5: a 200 s guard skipped the row at 189 s left).
    if _remaining() < 120:
        print(f"# streamed row skipped (budget: {_remaining():.0f}s "
              "left)", flush=True)
        return
    n_big, nq_big, knn, shard = 200_000_000, 1_000, 100, 100_000_000
    try:
        # host-side packed codes, chunked gen (one giant rng call
        # degrades to ~10 MB/s on this container); uniform random
        # bytes ARE uniform random codes at h=256
        host_packed = np.empty((n_big, M // 4), np.int32)
        step = n_big // 8
        for i in range(8):
            host_packed[i * step:(i + 1) * step] = rng.integers(
                -(1 << 31), 1 << 31, size=(step, M // 4), dtype=np.int64
            ).astype(np.int32)
        Qb = Q[:nq_big]

        def call():
            s, _ = search_codes_streamed(C, host_packed, Qb, knn,
                                         pq=True, d=D, mprime=M,
                                         shard_n=shard)
            _ = np.asarray(s[0, :1])
        tw = time.monotonic()
        call()                                        # compile/warm
        warm_s = time.monotonic() - tw
        # Each rep streams 1.6 GB host->HBM — 40-140 s depending on
        # the day's tunnel, so budget the reps against the MEASURED
        # warm-call cost: the first rep always runs (the warm stream
        # is sunk and a 1-rep row beats a missing row; this row runs
        # LAST so it can only cost itself), a second only if it
        # provably fits the remaining budget.
        dt, spread = _timed(
            call, reps=2 if _remaining() > 2.2 * warm_s else 1)
        qps = nq_big / dt
        base = SCAN_BASELINE_QPS * N / n_big
        emit("codes_scan_qps_streamed_2e8_knn100", qps, "queries/s",
             qps / base, spread)
        del host_packed
    except Exception as e:
        print(f"# streamed 2e8 scan unavailable ({type(e).__name__}: "
              f"{e})", flush=True)


def bench_scan_1b(jax, jnp, rng, C, Q):
    """SIFT1B-scale: the whole 8 GB packed base chip-resident, 120
    exact-merged segments (round-2 headline, now driver-captured)."""
    from rayuela_tpu.search.scan_codes_pallas import (CodesIndex,
                                                      search_codes)

    if os.environ.get("RAYUELA_BENCH_1B", "1") == "0":
        print("# 1b row skipped (RAYUELA_BENCH_1B=0)", flush=True)
        return
    # on-device gen is seconds; compile + warm + 2 reps at ~20-30 s
    # each still needs a real remaining budget.
    if _remaining() < 180:
        print(f"# 1b row skipped (budget: {_remaining():.0f}s left)",
              flush=True)
        return
    n_big, nq_big, knn = 1_000_000_000, 1_000, 100
    try:
        packed = _random_packed_codes(jax, jnp, rng, n_big)
        idx = CodesIndex(packed, M, C, pq=True, d=D, norms_cbook=None)
        Qb = Q[:nq_big]
        out = search_codes(idx, Qb, knn)
        _ = np.asarray(out[0][0, :1])

        def call():
            search_codes(idx, Qb, knn)
        dt, spread = _timed(call, reps=2)
        qps = nq_big / dt
        base = SCAN_BASELINE_QPS * N / n_big
        emit("codes_scan_qps_1b_m8_knn100", qps, "queries/s",
             qps / base, spread)
        del idx, packed
    except Exception as e:
        print(f"# 1b codes scan unavailable ({type(e).__name__}: "
              f"{e})", flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/rayuela_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    jax.block_until_ready((C, B, Q))

    # Order: headline rows first, the 1e8 row EARLY (it was lost when
    # the driver killed the r03 run at its time budget), the 8 GB 1e9
    # row last behind the remaining-budget guard.
    _mark("adc scan")
    index = bench_scan(jax, jnp, rng, C, B, Q)
    _mark("sharded 1-dev")
    bench_sharded(jax, jnp, index, Q)
    del index
    _mark("codes scan m8")
    bench_scan_codes(jax, jnp, rng, C, B, Q, ms=(8,))
    _mark("codes scan 100m")
    bench_scan_100m(jax, jnp, rng, C, Q)
    _mark("codes scan m16")
    bench_scan_codes(jax, jnp, rng, C, B, Q, ms=(16,))
    _mark("icm encode")
    bench_encode(jax, jnp, rng)
    _mark("viterbi encode")
    bench_viterbi(jax, jnp, rng)
    _mark("codes scan 1b")
    bench_scan_1b(jax, jnp, rng, C, Q)
    _mark("codes scan streamed 2e8")
    bench_scan_streamed(jax, jnp, rng, C, Q)
    _mark("done")


if __name__ == "__main__":
    main()
