"""On-chip sweep of the two-pass decode-once codes kernel's tunables
(NEXT.md perf lever 2): rows2 x bq x keep interaction, m8 and m16,
k in {100, 1000}. Interleaved within each config class; reports
best-of-3 wall plus flag counts (flags mean exact-rescue cost e2e).

Run standalone: timeout 5400 python demos/bench_2pass_tune.py /tmp/2pass.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/2pass.log"
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
        build_decode_operands, pack_codes,
        pallas_scan_codes_decode_topk_2p)

    log("devices:", jax.devices())
    N, D, H, NQ = 1_000_000, 128, 256, 10_000
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)

    def make(m):
        C = jnp.asarray(rng.standard_normal((m, H, D // m)), jnp.float32)
        B = jnp.asarray(rng.integers(0, H, size=(N, m)), jnp.int32)
        packed = pack_codes(B)
        Cf, nrm = build_decode_operands(C, pq=True, d=D)
        return Cf, nrm, packed

    ops = {8: make(8), 16: make(16)}

    def run(m, k, rows2, bq, keep, vmem):
        Cf, nrm, packed = ops[m]
        t0 = time.perf_counter()
        s, i, fl = pallas_scan_codes_decode_topk_2p(
            Q, Cf, nrm, packed, k=k, pq=True, r=rows2, bq=bq,
            tile=8192, keep=keep, keep2=0, rows2=rows2,
            vmem_mb=vmem)
        nfl = int(np.asarray(fl).sum())   # host pull = hard sync
        dt = time.perf_counter() - t0
        return dt, nfl

    # config classes: (m, k, current-default rows2/bq/keep)
    for m, k in [(8, 1000), (8, 100), (16, 1000), (16, 100)]:
        cur_rows2 = 16 if k <= 512 else 32
        cur_keep = 2 if k <= 512 else 4
        cur_bq = 512 if (m == 8 or k <= 512) else 256
        cands = {(cur_rows2, cur_bq, cur_keep)}
        for rows2 in (16, 32, 64):
            if rows2 < cur_keep or k > rows2 * 128:
                continue
            cands.add((rows2, cur_bq, cur_keep))
        for bq in (128, 256, 512):
            cands.add((cur_rows2, bq, cur_keep))
        for keep in (2, 4, 8):
            if keep <= cur_rows2:
                cands.add((cur_rows2, cur_bq, keep))
        cands = sorted(cands)
        best = {}
        failed = set()   # don't mutate cands mid-rep: surviving
        # configs would silently lose a best-of-3 rep (ADVICE r3)
        for rep in range(3):
            for cfg in cands:
                if cfg in failed:
                    continue
                rows2, bq, keep = cfg
                vmem = 100 if bq > 256 else 64
                try:
                    dt, nfl = run(m, k, rows2, bq, keep, vmem)
                except Exception as e:
                    log(f"m{m} k{k} rows2={rows2} bq={bq} keep={keep}: "
                        f"FAIL {type(e).__name__}: {str(e)[:90]}")
                    failed.add(cfg)
                    continue
                prev = best.get(cfg, (1e9, 0))
                best[cfg] = (min(prev[0], dt), nfl)
                log(f"m{m} k{k} rows2={rows2} bq={bq} keep={keep} "
                    f"rep{rep}: {dt*1000:.1f} ms ({NQ/dt:.0f} qps) "
                    f"flags={nfl}")
        if best:
            win = min(best, key=lambda c: best[c][0])
            dt, nfl = best[win]
            tag = "DEFAULT" if win == (cur_rows2, cur_bq, cur_keep) \
                else "NEW-BEST"
            log(f"m{m} k{k} WINNER {tag}: rows2={win[0]} bq={win[1]} "
                f"keep={win[2]} -> {NQ/dt:.0f} qps, flags={nfl}")


if __name__ == "__main__":
    main()
