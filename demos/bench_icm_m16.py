"""m16 ICM roof decomposition (VERDICT r3 #7): is the 1.9x m8->m16
slowdown the (m*h, d) slab work or the per-node visit loop, and does a
bigger kernel chunk (larger per-visit matmuls, better MXU efficiency)
buy anything?

Method: time `icm_sweeps_pallas` directly (one launch, icmiter=4, the
unit the ILS loop relaunches 8x) at m in {8, 16}:
  * icmiter=0 runs ONLY the per-chunk fixed work (unaries slab matmul,
    one-hot rebuild, energy pass) — the "slab" share;
  * icmiter=4 adds the 4*m-visit loop — the delta is the visit loop;
  * chunk in {256, 512} A/Bs the small-matmul-efficiency lever.

Run standalone: timeout 3600 python demos/bench_icm_m16.py /tmp/icm16.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/icm16.log"
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

    from rayuela_tpu.ops.icm_pallas import icm_sweeps_pallas

    log("devices:", jax.devices())
    N, D, H = 200_000, 128, 256
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def sync(x):
        jax.block_until_ready(x)
        return np.asarray(x[0][0, 0])

    for m in (8, 16):
        C = jnp.asarray(rng.standard_normal((m, H, D)) * 0.2, jnp.float32)
        B = jnp.asarray(rng.integers(0, H, size=(N, m)), jnp.int32)
        order = jnp.arange(m, dtype=jnp.int32)
        jax.block_until_ready((C, B))
        for chunk in (256, 512):
            vm = None if chunk == 256 else 128
            try:
                for icm in (0, 4):
                    sync(icm_sweeps_pallas(X, C, B, order, icm,
                                           chunk=chunk, vmem_mb=vm))
            except Exception as e:
                log(f"m{m} chunk{chunk}: FAIL {type(e).__name__}: "
                    f"{str(e)[:120]}")
                continue
            best = {0: 1e9, 4: 1e9}
            for rep in range(4):
                for icm in (0, 4):
                    t0 = time.perf_counter()
                    sync(icm_sweeps_pallas(X, C, B, order, icm,
                                           chunk=chunk, vmem_mb=vm))
                    dt = time.perf_counter() - t0
                    best[icm] = min(best[icm], dt)
            fixed, full = best[0], best[4]
            visits = full - fixed
            log(f"m{m} chunk{chunk}: icmiter=0 {fixed*1000:.1f} ms | "
                f"icmiter=4 {full*1000:.1f} ms -> visit loop "
                f"{visits*1000:.1f} ms ({visits/full*100:.0f}%), "
                f"{N/full:.0f} v/s per launch")


if __name__ == "__main__":
    main()
