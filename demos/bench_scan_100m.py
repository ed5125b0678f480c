"""SIFT100M-scale single-chip scan: 1e8 codes resident on one v5e.

The decoded base would be 51 GB (f32) — impossible on a 16 GB chip;
the packed m=8 code array is 800 MB. The reference handles this scale
by streaming codes through CPU caches (`deps/src/linscan_aqd.cpp` over
host RAM); here the WHOLE base is chip-resident and every segment runs
the fused in-kernel-decode scan (`search/scan_codes_pallas.py`,
segmented beyond the packed-id range with an exact device-side top-k
merge).

Prints qps at knn=100/1000 (nq=1000, SIFT1B-protocol query count is
1e4 — scale linearly) and exact-checks a query subset against a
chunked XLA LUT oracle.
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_ap = argparse.ArgumentParser()
_ap.add_argument("--n", type=int, default=100_000_000,
                 help="base size (1e9 = SIFT1B scale, 8 GB packed — "
                      "still one chip)")
_ap.add_argument("--nq", type=int, default=1_000)
_ap.add_argument("--no-oracle", action="store_true")
_args = _ap.parse_args()

N, D, M, H, NQ = _args.n, 128, 8, 256, _args.nq
NCHECK = 8          # queries to exact-check against the XLA oracle


def log(msg):
    print(msg, flush=True)


def main():
    from rayuela_tpu.search.scan_codes_pallas import (
        CodesIndex, build_luts, search_codes, unpack_codes,
        xla_lut_scan)
    import bench

    rng = np.random.default_rng(0)
    C = rng.standard_normal((M, H, D // M)).astype(np.float32)
    Q = rng.standard_normal((NQ, D)).astype(np.float32)

    # Generate the packed codes ON-DEVICE (uniform random bytes ARE
    # uniform h=256 codes in pack_codes layout): 1.6 s for the 8 GB
    # 1e9 array vs ~150 s for host gen + tunnel device_put (round 4).
    t0 = time.perf_counter()
    packed = bench._random_packed_codes(jax, jnp, rng, N)
    log(f"on-device gen: {time.perf_counter() - t0:.1f} s "
        f"({packed.nbytes / 1e6:.0f} MB)")
    index = CodesIndex(packed, M, jnp.asarray(C), pq=True, d=D,
                       norms_cbook=None)

    for k in (100, 1000):
        # warm-up/compile
        s, i = search_codes(index, jnp.asarray(Q), k)
        jax.block_until_ready((s, i))
        _ = np.asarray(s[0, 0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s, i = search_codes(index, jnp.asarray(Q), k)
            jax.block_until_ready((s, i))
            _ = np.asarray(s[0, 0])
            best = min(best, time.perf_counter() - t0)
        log(f"k={k}: {best:.2f} s for nq={NQ} over n={N:.0e} "
            f"= {NQ / best:.0f} qps "
            f"({NQ / best * N / 1e12:.2f} T code-dists/s)")

    if _args.no_oracle:
        log("done (oracle skipped)")
        return

    # exact check on a subset: chunked XLA LUT oracle
    qs = jnp.asarray(Q[:NCHECK])
    T = build_luts(jnp.asarray(C), qs, pq=True, d=D)
    k = 100
    bs, bi = None, None
    # (nq, chunk, m) gather intermediate must fit HBM next to the
    # 800 MB packed index: 8 x 1e6 x 8 f32 = 256 MB
    chunk = 1_000_000
    for st in range(0, N, chunk):
        Bc = unpack_codes(packed[st:st + chunk], M)
        sc, ic = xla_lut_scan(T, Bc, k, lut_dtype=jnp.bfloat16)
        ic = ic + st
        if bs is None:
            bs, bi = sc, ic
        else:
            cs = jnp.concatenate([bs, sc], axis=1)
            ci = jnp.concatenate([bi, ic], axis=1)
            neg, loc = jax.lax.top_k(-cs, k)
            bs, bi = -neg, jnp.take_along_axis(ci, loc, axis=1)
    q2 = jnp.sum(qs * qs, axis=-1, keepdims=True)
    bs = bs + q2
    s, i = search_codes(index, qs, k)
    # positional id equality is meaningless at this scale: 1e8 random
    # codes pack the k-boundary with bf16-resolution score ties, and
    # tie ORDER differs between the packed total order (truncated
    # score, row id) and the oracle's top_k. Set overlap is the metric
    # that matters for recall.
    overlap = np.mean([
        len(set(np.asarray(i)[q]) & set(np.asarray(bi)[q])) / k
        for q in range(NCHECK)])
    np.testing.assert_allclose(np.asarray(s), np.asarray(bs),
                               rtol=2e-2, atol=2e-2)
    assert overlap > 0.8, overlap
    log(f"oracle check: top-{k} set overlap {overlap:.4f} "
        f"(remainder = boundary score-ties), scores match")
    log("done")


if __name__ == "__main__":
    main()
