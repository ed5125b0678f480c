#!/usr/bin/env python
"""Hardware sweep of the per-tile pre-reduction scan configs (keep>0)
vs the tuned pack32 baselines, SIFT1M protocol shapes.

Writes one line per config; run on the real chip:
    timeout 3600 python -u demos/bench_prered.py > /tmp/prered.log
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

from rayuela_tpu.search.scan_pallas import build_index, pallas_scan_topk

N, D, M, H, NQ = 1_000_000, 128, 8, 256, 10_000

# (label, k, dict(r=, bq=, tile=, keep=, pack=))
CONFIGS = [
    ("base k=1000 (auto)", 1000, dict(r=24, bq=256, tile=1024, pack=True)),
    ("k=1000 keep4 r28 t2048 bq256", 1000,
     dict(r=28, bq=256, tile=2048, keep=4, pack=True)),
    ("k=1000 keep4 r28 t4096 bq128", 1000,
     dict(r=28, bq=128, tile=4096, keep=4, pack=True)),
    ("k=1000 keep4 r28 t4096 bq256", 1000,
     dict(r=28, bq=256, tile=4096, keep=4, pack=True)),
    ("k=1000 keep8 r24 t2048 bq256", 1000,
     dict(r=24, bq=256, tile=2048, keep=8, pack=True)),
    ("k=1000 keep4 r28 t2048 bq512", 1000,
     dict(r=28, bq=512, tile=2048, keep=4, pack=True)),
    ("base k=100 (auto)", 100, dict(r=8, bq=1024, tile=1024, pack=True)),
    ("k=100 keep2 r14 t2048 bq512", 100,
     dict(r=14, bq=512, tile=2048, keep=2, pack=True)),
    ("k=100 keep2 r14 t4096 bq256", 100,
     dict(r=14, bq=256, tile=4096, keep=2, pack=True)),
    ("k=100 keep4 r12 t2048 bq512", 100,
     dict(r=12, bq=512, tile=2048, keep=4, pack=True)),
    ("k=100 keep2 r14 t1024 bq1024", 100,
     dict(r=14, bq=1024, tile=1024, keep=2, pack=True)),
    ("k=100 keep4 r12 t4096 bq512", 100,
     dict(r=12, bq=512, tile=4096, keep=4, pack=True)),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((M, H, D // M)), jnp.float32)
    B = jnp.asarray(rng.integers(0, H, size=(N, M)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((NQ, D)), jnp.float32)
    idx = build_index(C, B, pq=True, d=D)
    jax.block_until_ready(idx.Xd)
    print("index ready", flush=True)

    for label, k, kw in CONFIGS:
        try:
            t0 = time.perf_counter()
            out = pallas_scan_topk(Q, idx.Xd, idx.x2, k=k, verify=True,
                                   **kw)
            jax.block_until_ready(out)
            _ = np.asarray(out[0][0, 0])
            tc = time.perf_counter() - t0
            best = np.inf
            for _rep in range(3):
                t0 = time.perf_counter()
                out = pallas_scan_topk(Q, idx.Xd, idx.x2, k=k,
                                       verify=True, **kw)
                jax.block_until_ready(out)
                _ = np.asarray(out[0][0, 0])
                best = min(best, time.perf_counter() - t0)
            nflag = int(np.asarray(out[2]).sum())
            print(f"{label:34s} {NQ / best:9.0f} qps  "
                  f"flagged={nflag}  (compile+first {tc:.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"{label:34s} FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
