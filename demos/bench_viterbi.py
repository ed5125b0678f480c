"""TPU bench: Pallas Viterbi vs XLA batched min-plus (ChainQ encode).

Run standalone: timeout 3000 python demos/bench_viterbi.py /tmp/vit.log
"""

import sys
import time

sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vit.log"
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

    from rayuela_tpu.ops.viterbi import _viterbi_encode_xla
    from rayuela_tpu.ops.viterbi_pallas import viterbi_encode_pallas

    log("devices:", jax.devices())
    n, d, m, h = 100_000, 128, 8, 256
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.2, jnp.float32)
    jax.block_until_ready((X, C))
    log("data ready")

    t0 = time.perf_counter()
    Bp = viterbi_encode_pallas(X, C, bc=256)
    _ = np.asarray(Bp[0, :1])
    log(f"pallas compile+first {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    Bp = viterbi_encode_pallas(X, C, bc=256)
    _ = np.asarray(Bp[0, :1])
    dt1 = time.perf_counter() - t0
    log(f"pallas viterbi: {n/dt1:.0f} vecs/s ({dt1:.2f}s)")

    nx = 20_000
    t0 = time.perf_counter()
    Bx = _viterbi_encode_xla(X[:nx], C, chunk=2048)
    _ = np.asarray(Bx[0, :1])
    log(f"xla compile+first {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    Bx = _viterbi_encode_xla(X[:nx], C, chunk=2048)
    _ = np.asarray(Bx[0, :1])
    dt2 = time.perf_counter() - t0
    log(f"xla viterbi: {nx/dt2:.0f} vecs/s ({dt2:.2f}s)")

    # agreement (argmin ties may flip on near-ties; expect ~identical)
    agree = (np.asarray(Bp[:nx]) == np.asarray(Bx)).mean()
    log(f"code agreement: {agree:.4f}; speedup {(n/dt1)/(nx/dt2):.1f}x")
    assert agree > 0.99
    log("DONE")


if __name__ == "__main__":
    main()
