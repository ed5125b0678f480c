"""TPU bench: running-sum ICM kernel — relaunch ILS vs single-launch.

Run standalone: timeout 3000 python demos/bench_icm_ils.py /tmp/ils.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ils.log"
_log = open(LOG, "w")


def log(*a):
    print(*a, file=_log, flush=True)
    print(*a, flush=True)


def run_relaunch(X, C, B0, orders, pkeys, ils, icm, npert, h):
    import jax.numpy as jnp

    from rayuela_tpu.ops.icm import _perturb
    from rayuela_tpu.ops.icm_pallas import icm_sweeps_pallas
    _, E = icm_sweeps_pallas(X, C, B0, orders[0], 0)
    B = B0
    for t in range(ils):
        Bt = _perturb(pkeys[t], B, npert, h)
        Bt, Et = icm_sweeps_pallas(X, C, Bt, orders[t], icm)
        keep = Et < E
        B = jnp.where(keep[:, None], Bt, B)
        E = jnp.minimum(Et, E)
    return B


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from rayuela_tpu.ops.icm import _ils_schedule
    from rayuela_tpu.ops.icm_pallas import encoding_ils_pallas
    from rayuela_tpu.ops.qerror import veccost_chunked

    log("devices:", jax.devices())
    n, d, h = 200_000, 128, 256
    ils, icm, npert = 8, 4, 4
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    key = jax.random.PRNGKey(0)
    seed = jnp.asarray([[42]], jnp.int32)

    for m in (8, 16):
        C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.2, jnp.float32)
        B0 = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
        pkeys, orders = _ils_schedule(key, m, ils, True)
        jax.block_until_ready((X, C, B0, orders))
        log(f"--- m={m} ---")

        t0 = time.perf_counter()
        B1, E1 = encoding_ils_pallas(X, C, B0, orders, seed, ilsiter=ils,
                                     icmiter=icm, npert=npert)
        _ = np.asarray(B1[0, :1])
        log(f"ils-kernel compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        B1, E1 = encoding_ils_pallas(X, C, B0, orders, seed, ilsiter=ils,
                                     icmiter=icm, npert=npert)
        _ = np.asarray(B1[0, :1])
        dt1 = time.perf_counter() - t0
        log(f"ils-kernel: {n/dt1:.0f} vecs/s ({dt1:.2f}s)")

        t0 = time.perf_counter()
        B2 = run_relaunch(X, C, B0, orders, pkeys, ils, icm, npert, h)
        _ = np.asarray(B2[0, :1])
        log(f"relaunch compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        B2 = run_relaunch(X, C, B0, orders, pkeys, ils, icm, npert, h)
        _ = np.asarray(B2[0, :1])
        dt2 = time.perf_counter() - t0
        log(f"relaunch: {n/dt2:.0f} vecs/s ({dt2:.2f}s)")

        c0 = float(veccost_chunked(X, C, B0).mean())
        c1 = float(veccost_chunked(X, C, B1).mean())
        c2 = float(veccost_chunked(X, C, B2).mean())
        log(f"cost start={c0:.4f} ils-kernel={c1:.4f} relaunch={c2:.4f}")
        assert c1 < c0 and abs(c1 - c2) / c2 < 0.03
        log(f"one-launch vs relaunch: {dt2/dt1:.2f}x")
    log("DONE")


if __name__ == "__main__":
    main()
