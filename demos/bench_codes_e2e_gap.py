"""Decompose the search_codes e2e vs bare-kernel gap for the two-pass
decode-once path (same-window interleaved; the 2026-08-20 sweep saw
the kernel at 112-147k qps where BASELINE's e2e rows say 66-75k).

Run standalone: timeout 3600 python demos/bench_codes_e2e_gap.py /tmp/gap.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gap.log"
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
        build_codes_index, build_decode_operands, pack_codes,
        pallas_scan_codes_decode_topk_2p, search_codes)

    log("devices:", jax.devices())
    N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    index = build_codes_index(C, B, pq=True, d=D)
    Cf, nrm = build_decode_operands(C, pq=True, d=D)
    packed = pack_codes(B)
    jax.block_until_ready((index.packed, Cf, packed))
    log("index ready")

    def kern(k, rows2, bq, keep):
        t0 = time.perf_counter()
        s, i, fl = pallas_scan_codes_decode_topk_2p(
            Q, Cf, nrm, packed, k=k, pq=True, r=rows2, bq=bq,
            tile=8192, keep=keep, keep2=0, rows2=rows2,
            vmem_mb=100 if bq > 256 else 64)
        nfl = int(np.asarray(fl).sum())
        return time.perf_counter() - t0, nfl

    def e2e(k):
        # bench.py methodology: search_codes hard-syncs internally via
        # the flags pull; no extra id fetch
        t0 = time.perf_counter()
        s, i = search_codes(index, Q, k)
        return time.perf_counter() - t0, -1

    def e2e_pull(k):
        t0 = time.perf_counter()
        s, i = search_codes(index, Q, k)
        _ = np.asarray(i[0, :1])
        return time.perf_counter() - t0, -1

    for k, rows2, bq, keep in [(1000, 32, 512, 4), (100, 16, 512, 2)]:
        funcs = {"kern": lambda: kern(k, rows2, bq, keep),
                 "e2e": lambda: e2e(k),
                 "e2e_pull": lambda: e2e_pull(k)}
        best = {}
        for rep in range(4):
            for name, fn in funcs.items():
                dt, nfl = fn()
                best[name] = min(best.get(name, 1e9), dt)
                log(f"k={k} {name} rep{rep}: {dt*1000:.1f} ms "
                    f"({NQ/dt:.0f} qps) flags={nfl}")
        gap = best["e2e"] / best["kern"]
        log(f"k={k} BEST kern {NQ/best['kern']:.0f} qps / e2e "
            f"{NQ/best['e2e']:.0f} qps -> e2e/kern wall {gap:.2f}x")


if __name__ == "__main__":
    main()
