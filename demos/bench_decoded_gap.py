"""Same-window e2e-vs-kernel decomposition for the DECODED scan path
(companion to bench_codes_e2e_gap.py). search() at k=100 defaults to
the premin inline-rescue path; k=1000 runs premin=0 + host rescue on
flags — this measures whether flags occur at the protocol shape and
what they cost e2e.

Run standalone: timeout 2400 python demos/bench_decoded_gap.py /tmp/dgap.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dgap.log"
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

    from rayuela_tpu.search.scan_pallas import (_auto_config, build_index,
                                                pallas_scan_topk, search)

    log("devices:", jax.devices())
    N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    index = build_index(C, B, pq=True, d=D, dtype=jnp.bfloat16)
    jax.block_until_ready(index.Xd)
    log("index ready (bf16)")

    def kern(k):
        r, bq, tile, keep, stage, premin = _auto_config(
            k, NQ, True, f32_index=False, n=N)
        vm = 64 if (tile > 4096 or stage) else None
        t0 = time.perf_counter()
        d1, i1, fl = pallas_scan_topk(
            Q, index.Xd, index.x2, k=k, r=r, bq=bq, tile=tile,
            verify=True, pack=True, keep=keep, vmem_mb=vm, stage=stage,
            premin=0)
        nfl = int(np.asarray(fl).sum())
        return time.perf_counter() - t0, nfl

    def e2e(k):
        t0 = time.perf_counter()
        search(index, Q, k)
        return time.perf_counter() - t0, -1

    for k in (1000, 100):
        funcs = {"kern": lambda: kern(k), "e2e": lambda: e2e(k)}
        best = {}
        for rep in range(4):
            for name, fn in funcs.items():
                dt, nfl = fn()
                best[name] = min(best.get(name, 1e9), dt)
                log(f"k={k} {name} rep{rep}: {dt*1000:.1f} ms "
                    f"({NQ/dt:.0f} qps) flags={nfl}")
        log(f"k={k} BEST kern {NQ/best['kern']:.0f} qps / e2e "
            f"{NQ/best['e2e']:.0f} qps -> "
            f"{best['e2e']/best['kern']:.2f}x")


if __name__ == "__main__":
    main()
