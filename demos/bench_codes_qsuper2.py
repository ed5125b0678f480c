#!/usr/bin/env python
"""Follow-up qsuper sweep: probe past the round-1 winners (qs16 at
m8 k=1000; qs8 elsewhere) and re-measure the winners for stability.

    timeout 4200 python -u demos/bench_codes_qsuper2.py > /tmp/cqs2.log
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                  search_codes)

N, D, H, NQ = 1_000_000, 128, 256, 10_000

CONFIGS = [
    ("m8  k=1000 qs8  (winner)", 8, 1000,
     dict(r=28, bq=256, tile=4096, keep=4, qsuper=8)),
    ("m8  k=1000 qs16", 8, 1000,
     dict(r=28, bq=256, tile=4096, keep=4, qsuper=16)),
    ("m8  k=100  qs4  (winner)", 8, 100,
     dict(r=12, bq=512, tile=2048, keep=4, qsuper=4)),
    ("m8  k=100  qs8", 8, 100,
     dict(r=12, bq=512, tile=2048, keep=4, qsuper=8)),
    ("m8  k=100  keep2 qs4", 8, 100,
     dict(r=14, bq=512, tile=2048, keep=2, qsuper=4)),
    ("m16 k=1000 qs4  (winner)", 16, 1000,
     dict(r=28, bq=256, tile=4096, keep=4, qsuper=4)),
    ("m16 k=1000 qs8", 16, 1000,
     dict(r=28, bq=256, tile=4096, keep=4, qsuper=8)),
    ("m16 k=100  qs2  (winner)", 16, 100,
     dict(r=12, bq=512, tile=2048, keep=4, qsuper=2)),
    ("m16 k=100  qs4 rerun", 16, 100,
     dict(r=12, bq=512, tile=2048, keep=4, qsuper=4)),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    idxs = {}
    for m in (8, 16):
        C = jnp.asarray(rng.standard_normal((m, H, D // m)), jnp.float32)
        B = jnp.asarray(rng.integers(0, H, size=(N, m)), jnp.int32)
        idxs[m] = build_codes_index(C, B, pq=True, d=D)
        jax.block_until_ready(idxs[m].packed)
    print("indexes ready", flush=True)

    for label, m, k, kw in CONFIGS:
        idx = idxs[m]
        try:
            t0 = time.perf_counter()
            out = search_codes(idx, Q, k, mode="decode", vmem_mb=128,
                               **kw)
            jax.block_until_ready(out); _ = np.asarray(out[0][0, 0])
            tc = time.perf_counter() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = search_codes(idx, Q, k, mode="decode",
                                   vmem_mb=128, **kw)
                jax.block_until_ready(out); _ = np.asarray(out[0][0, 0])
                best = min(best, time.perf_counter() - t0)
            print(f"{label:36s} {NQ/best:9.0f} qps (c+f {tc:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"{label:36s} FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
