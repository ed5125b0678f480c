#!/usr/bin/env python
"""Mosaic pass-fusion probe (VERDICT r4 #7 — the last open decoded-
scan floor lever).

The decoded-scan floor decomposition (NEXT.md 2026-08-19) showed the
kernel's cost is dominated by full-size elementwise passes over the
(tile, bq) f32 score block (~3-6 us each), not the MXU matmul (~22%).
The only remaining floor lever was "fuse the x2-add + bitcast +
first tournament level into one pass — Mosaic scheduling territory".

This probe answers whether that lever EXISTS: a Pallas kernel streams
the same 8 MB block per grid step and applies k chained elementwise
ops before a reduction. If Mosaic fuses elementwise chains into one
pass over the block, wall time is ~flat in k; if each op is a
separate full-block VMEM pass, wall time grows linearly with slope =
the per-pass cost — in which case the fusion lever is real but NOT
reachable from Pallas source (op count is already minimal; the
scheduling is Mosaic's), and the floor item closes as wontfix.

Second probe: the same chain written as one fused expression vs
separate statements — confirms (or refutes) that source form is
irrelevant to Mosaic's scheduling.

Usage: python demos/bench_mosaic_fusion.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/rayuela_jax_cache")

ROWS, BQ, NTILES = 8192, 256, 128          # 8 MB f32 per grid step


def _kernel_chain(x_ref, o_ref, acc, *, k: int, split: bool):
    """k chained elementwise ops over the full block, then a running
    min-reduce (so nothing is dead-code-eliminated)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.full(acc.shape, jnp.inf, jnp.float32)

    y = x_ref[:]
    if split:
        # separate statements (what the scan kernel's source looks
        # like: transform, then key pack, then merge level)
        for i in range(k):
            y = y * 1.0000001 + 0.5
    else:
        # one nested expression — same dataflow, single statement
        expr = y
        for i in range(k):
            expr = expr * 1.0000001 + 0.5
        y = expr
    acc[:] = jnp.minimum(acc[:], jnp.min(
        y.reshape(ROWS // 8, 8, BQ), axis=0))

    @pl.when(t == NTILES - 1)
    def _():
        o_ref[:] = acc[:]


def run_variant(X, k: int, split: bool) -> float:
    kern = functools.partial(_kernel_chain, k=k, split=split)
    fn = pl.pallas_call(
        kern,
        grid=(NTILES,),
        in_specs=[pl.BlockSpec((ROWS, BQ), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, BQ), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, BQ), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, BQ), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )
    jitted = jax.jit(fn)
    out = jitted(X)
    _ = np.asarray(out[0, :1])                       # warm + sync
    best = np.inf
    for _rep in range(4):
        t0 = time.perf_counter()
        out = jitted(X)
        _ = np.asarray(out[0, :1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((NTILES * ROWS, BQ)),
                    jnp.float32)
    jax.block_until_ready(X)
    print(f"block: {ROWS}x{BQ} f32 ({ROWS * BQ * 4 / 2**20:.0f} MB) "
          f"x {NTILES} grid steps "
          f"({NTILES * ROWS * BQ * 4 / 2**30:.1f} GB streamed/call)")

    results = {}
    for split in (True, False):
        tag = "split-stmts" if split else "one-expr"
        for k in (0, 1, 2, 4, 8):
            dt = run_variant(X, k, split)
            results[(tag, k)] = dt
            print(f"{tag:12s} k={k}: {dt * 1e3:7.2f} ms "
                  f"({dt / NTILES * 1e6:6.2f} us/step)")

    # slope of ms vs k for the split form = per-extra-op cost per call
    ks = np.array([1, 2, 4, 8], float)
    ts = np.array([results[("split-stmts", int(k))] for k in ks])
    slope = np.polyfit(ks, ts, 1)[0]
    base = results[("split-stmts", 0)]
    per_step = slope / NTILES * 1e6
    stream_us = ROWS * BQ * 4 / 1.3e12 * 1e6   # ~1.3 TB/s VMEM est.
    print(f"\nper-extra-op: {slope * 1e3:.2f} ms/call = "
          f"{per_step:.2f} us/grid-step "
          f"(full-block VMEM stream ~{stream_us:.1f} us)")
    print(f"k=0 baseline {base * 1e3:.2f} ms/call")
    same = abs(results[('split-stmts', 8)] - results[('one-expr', 8)]) \
        / results[('one-expr', 8)]
    print(f"split vs one-expr at k=8: {same * 100:.1f}% apart "
          "(source form irrelevant if small)")
    if per_step < 0.2 * stream_us:
        print("VERDICT: Mosaic FUSES elementwise chains — the op chain"
              " is not the floor; revisit the decomposition.")
    else:
        print("VERDICT: each elementwise op costs a material fraction "
              "of a full VMEM pass — op count is already minimal in "
              "the scan kernel, nothing to fuse from Pallas source. "
            "WONTFIX.")


if __name__ == "__main__":
    main()
