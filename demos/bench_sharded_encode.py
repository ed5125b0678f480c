"""Sharded SR train step on a 1-device mesh, REAL chip: the Pallas ICM
kernel inside shard_map (VERDICT r2 item 3's hardware half). Compares
the sharded step's encode throughput against the direct public
encoding_icm on the same data — the 1-chip starting point the >=85%
multi-chip scaling target will be measured from.

    timeout 3600 python demos/bench_sharded_encode.py /tmp/shenc.log
"""
import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/shenc.log"
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

    from rayuela_tpu.ops.icm import encoding_icm
    from rayuela_tpu.parallel.lsq_sharded import make_sr_train_step
    from rayuela_tpu.parallel.mesh import make_mesh, shard_data

    log("devices:", jax.devices())
    n, d, m, h = 200_000, 128, 8, 256
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.2, jnp.float32)
    B0 = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    jax.block_until_ready((X, C, B0))
    key = jax.random.PRNGKey(0)
    kw = dict(ilsiter=8, icmiter=4, npert=4, randord=True)

    def sync(x):
        jax.block_until_ready(x)
        a = x[0] if isinstance(x, tuple) else x
        while a.ndim:
            a = a[0]
        return np.asarray(a)

    # direct public API (Pallas running-sum ICM auto-dispatched on TPU)
    sync(encoding_icm(key, X, C, B0, **kw))
    t_direct = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        sync(encoding_icm(key, X, C, B0, **kw))
        t_direct = min(t_direct, time.perf_counter() - t0)
    log(f"direct encoding_icm: {n / t_direct:,.0f} vecs/s "
        f"({t_direct:.2f} s)")

    # sharded full SR-D train step on a 1-device mesh (codebook solve +
    # SR noise + encode + psum objective, all under shard_map)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    step = make_sr_train_step(mesh, h=h, niter=4, **kw, chunk=8192,
                              stats_chunk=16384)
    Xs, Bs = shard_data(mesh, X), shard_data(mesh, B0)
    out = step(Xs, Bs, C, jnp.int32(0), key)
    sync(out)
    t_step = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = step(Xs, Bs, C, jnp.int32(0), key)
        sync(out)
        t_step = min(t_step, time.perf_counter() - t0)
    log(f"sharded SR-D step (solve+encode): {n / t_step:,.0f} vecs/s "
        f"({t_step:.2f} s) obj={float(out[2]):.4f}")
    log(f"step/direct-encode ratio: {t_step / t_direct:.3f} "
        "(the step also solves the (2048,2048) system + SR noise)")
    log("DONE")


if __name__ == "__main__":
    main()
