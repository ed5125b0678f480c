"""Where does the encoding_icm API lose vs raw kernel throughput?

Measures, at m=8 and m=16 (n=200k, ils8/icm4/npert4):
  1. full `encoding_icm(impl='pallas')` API
  2. the same fori_loop but with perturb/accept stripped (kernel-only
     rounds, same launch structure)
  3. one `icm_sweeps_pallas` round x ilsiter (the 'kernel-level' number)
  4. the E0 (icmiter=0) call alone
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rayuela_tpu.ops.icm import encoding_icm, _perturb, _ils_schedule
from rayuela_tpu.ops.icm_pallas import icm_sweeps_pallas

N, D, H = 200_000, 128, 256
ILS, ICM, NPERT = 8, 4, 4


def log(msg):
    print(msg, flush=True)


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    for m in (8, 16):
        C = jnp.asarray(rng.standard_normal((m, H, D)) * 0.2, jnp.float32)
        B0 = jnp.asarray(rng.integers(0, H, size=(N, m)), jnp.int32)
        jax.block_until_ready((X, C, B0))
        log(f"== m={m}")

        # 1) full API
        kw = dict(ilsiter=ILS, icmiter=ICM, npert=NPERT, randord=True)
        out = encoding_icm(key, X, C, B0, impl="pallas", **kw)
        jax.block_until_ready(out)

        def call_api():
            o = encoding_icm(key, X, C, B0, impl="pallas", **kw)
            jax.block_until_ready(o)
            _ = np.asarray(o[0, 0])
        t = best_of(call_api)
        log(f"  full API: {t*1e3:.1f} ms = {N/t:.0f} vps")

        # 2) kernel-only rounds inside one jit (no perturb/accept/E0)
        @partial(jax.jit, static_argnames=())
        def rounds_only(X, C, B0, orders):
            def body(t, B):
                Bt, Et = icm_sweeps_pallas(X, C, B, orders[t], ICM)
                return Bt
            return lax.fori_loop(0, ILS, body, B0)

        pkeys, orders = _ils_schedule(key, m, ILS, True)
        o = rounds_only(X, C, B0, orders)
        jax.block_until_ready(o)

        def call_rounds():
            o = rounds_only(X, C, B0, orders)
            jax.block_until_ready(o)
            _ = np.asarray(o[0, 0])
        t_r = best_of(call_rounds)
        log(f"  kernel-only x{ILS} rounds: {t_r*1e3:.1f} ms = {N/t_r:.0f} vps")

        # 3) one sweeps call
        order0 = orders[0]
        o = icm_sweeps_pallas(X, C, B0, order0, ICM)
        jax.block_until_ready(o)

        def call_one():
            o = icm_sweeps_pallas(X, C, B0, order0, ICM)
            jax.block_until_ready(o)
            _ = np.asarray(o[0][0, 0])
        t1 = best_of(call_one)
        log(f"  one round: {t1*1e3:.1f} ms -> x{ILS} = {N/(t1*ILS):.0f} vps")

        # 4) E0 call
        o = icm_sweeps_pallas(X, C, B0, order0, 0)
        jax.block_until_ready(o)

        def call_e0():
            o = icm_sweeps_pallas(X, C, B0, order0, 0)
            jax.block_until_ready(o)
            _ = np.asarray(o[1][0])
        t0c = best_of(call_e0)
        log(f"  E0 call: {t0c*1e3:.1f} ms")

        # 5) perturb+accept glue alone inside one jit
        @jax.jit
        def glue_only(X, C, B0, orders, pkeys):
            def body(t, state):
                B, E = state
                Bt = _perturb(pkeys[t], B, NPERT, H)
                Et = jnp.sum(Bt.astype(jnp.float32), axis=1)
                keep = Et < E
                return (jnp.where(keep[:, None], Bt, B),
                        jnp.minimum(Et, E))
            B, _ = lax.fori_loop(0, ILS, body,
                                 (B0, jnp.full((N,), jnp.inf)))
            return B
        o = glue_only(X, C, B0, orders, pkeys)
        jax.block_until_ready(o)
        t_g = best_of(lambda: (jax.block_until_ready(
            glue_only(X, C, B0, orders, pkeys)), None)[1] or None)
        log(f"  glue-only loop: {t_g*1e3:.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
