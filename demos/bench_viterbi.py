"""TPU bench: Pallas Viterbi vs XLA batched min-plus (ChainQ encode).

VERDICT r3 #4: the original form of this bench timed Pallas at n=1e5
against XLA at n=2e4 in separate (non-interleaved) windows — which is
where BASELINE's round-2 "2.0x" came from; the driver bench's
interleaved same-n ratio reads ~1.09x. This rewrite is same-n,
rep-interleaved, at two batch sizes, so the ratio is trustworthy.

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
    d, m, h = 128, 8, 256
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.2, jnp.float32)

    def sync(B):
        jax.block_until_ready(B)
        return np.asarray(B[0, :1])

    for n in (100_000, 200_000):
        X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        jax.block_until_ready(X)
        Bp = viterbi_encode_pallas(X, C, bc=256)
        sync(Bp)
        Bx = _viterbi_encode_xla(X, C, chunk=2048)
        sync(Bx)
        agree = (np.asarray(Bp) == np.asarray(Bx)).mean()
        best = {"pallas": 1e9, "xla": 1e9}
        for rep in range(4):
            t0 = time.perf_counter()
            sync(viterbi_encode_pallas(X, C, bc=256))
            best["pallas"] = min(best["pallas"], time.perf_counter() - t0)
            t0 = time.perf_counter()
            sync(_viterbi_encode_xla(X, C, chunk=2048))
            best["xla"] = min(best["xla"], time.perf_counter() - t0)
        vp, vx = n / best["pallas"], n / best["xla"]
        log(f"n={n}: pallas {vp:.0f} v/s | xla {vx:.0f} v/s | "
            f"ratio {vp/vx:.3f} | code agreement {agree:.4f}")
    log("DONE")


if __name__ == "__main__":
    main()
