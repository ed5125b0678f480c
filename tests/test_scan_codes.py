"""Code-resident Pallas scan — equivalence with the XLA LUT oracle and
the decoded scan path, in interpret mode on CPU (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import random_dataset


def test_pack_unpack_roundtrip(rng):
    from rayuela_tpu.search.scan_codes_pallas import (pack_codes,
                                                      unpack_codes)
    for m in (3, 4, 7, 9, 16, 17):
        B = rng.integers(0, 256, (37, m)).astype(np.int32)
        P = pack_codes(jnp.asarray(B))
        assert P.shape == (37, -(-m // 4))
        np.testing.assert_array_equal(np.asarray(unpack_codes(P, m)), B)
    # norms byte appends as column m
    B = rng.integers(0, 256, (20, 4)).astype(np.int32)
    nc = rng.integers(0, 256, 20).astype(np.int32)
    P = pack_codes(jnp.asarray(B), jnp.asarray(nc))
    U = np.asarray(unpack_codes(P, 5))
    np.testing.assert_array_equal(U[:, :4], B)
    np.testing.assert_array_equal(U[:, 4], nc)


def _lut_brute(T, B):
    """Float64 LUT accumulate — the reference algorithm verbatim
    (`deps/src/linscan_aqd.cpp:37-102`)."""
    T = np.asarray(T, np.float64)
    mprime, h, nq = T.shape
    n = B.shape[0]
    s = np.zeros((nq, n))
    for j in range(mprime):
        s += T[j, B[:, j], :].T
    return s


def test_luts_pq_scores_are_true_distances(rng):
    from rayuela_tpu.ops.qerror import reconstruct_pq
    from rayuela_tpu.search.scan_codes_pallas import build_luts
    d, m, h, n, nq = 28, 4, 16, 300, 7   # uneven split: 28/4=7 per sub
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    T = build_luts(jnp.asarray(C), jnp.asarray(Q), pq=True, d=d)
    s = _lut_brute(T, B) + (Q ** 2).sum(-1, keepdims=True)
    Xd = np.asarray(reconstruct_pq(C, B, d))
    ref = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(s, ref, rtol=1e-4, atol=1e-3)


def test_luts_additive_with_norms_match_linscan_lsq_convention(rng):
    from rayuela_tpu.search.scan_codes_pallas import build_luts
    d, m, h, n, nq = 16, 3, 16, 200, 5
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h)
    norms_cbook = (rng.random(8).astype(np.float32) * 10)
    norms_codes = rng.integers(0, 8, n).astype(np.int32)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    T = build_luts(jnp.asarray(C), jnp.asarray(Q),
                   norms_cbook=jnp.asarray(norms_cbook))
    assert T.shape == (m + 1, h, nq)
    Bfull = np.concatenate([B, norms_codes[:, None]], axis=1)
    s = _lut_brute(T, Bfull)
    from rayuela_tpu.ops.qerror import reconstruct
    Xd = np.asarray(reconstruct(C, B))
    ref = -2.0 * Q @ Xd.T + norms_cbook[norms_codes][None, :]
    np.testing.assert_allclose(s, ref, rtol=1e-4, atol=1e-3)


def _run_kernel(T, packed, **kw):
    from rayuela_tpu.search.scan_codes_pallas import pallas_scan_codes_topk
    return pallas_scan_codes_topk(T, packed, interpret=True, **kw)


def test_kernel_matches_xla_lut_scan(rng):
    from rayuela_tpu.search.scan_codes_pallas import (build_luts,
                                                      pack_codes,
                                                      xla_lut_scan)
    d, m, h, n, nq, k = 32, 4, 16, 5000, 12, 50
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    T = build_luts(jnp.asarray(C), jnp.asarray(Q), pq=True, d=d)
    packed = pack_codes(jnp.asarray(B))
    sc, ids, flagged = _run_kernel(T, packed, k=k, r=48, bq=8,
                                   tile=2048, lut_dtype=jnp.float32)
    assert not np.asarray(flagged).any()
    ref_s, ref_i = xla_lut_scan(T, jnp.asarray(B), k)
    # values must match exactly-ranked; ids up to ties in decode space
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-3)
    s64 = _lut_brute(T, B)
    picked = np.take_along_axis(s64, np.asarray(ids), axis=1)
    np.testing.assert_allclose(picked, np.asarray(sc),
                               rtol=1e-4, atol=1e-3)


def test_kernel_bf16_tables_consistent(rng):
    """bf16 tables: kernel and XLA oracle see the same rounded tables,
    so results agree with each other (not with f32)."""
    from rayuela_tpu.search.scan_codes_pallas import (build_luts,
                                                      pack_codes,
                                                      xla_lut_scan)
    d, m, h, n, nq, k = 16, 4, 16, 3000, 6, 20
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    T = build_luts(jnp.asarray(C), jnp.asarray(Q), pq=True, d=d)
    packed = pack_codes(jnp.asarray(B))
    sc, ids, flagged = _run_kernel(T, packed, k=k, r=24, bq=8,
                                   tile=1024, lut_dtype=jnp.bfloat16)
    assert not np.asarray(flagged).any()
    ref_s, _ = xla_lut_scan(T, jnp.asarray(B), k,
                            lut_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)


def test_ragged_sizes(rng):
    """n not a multiple of tile, nq not a multiple of bq, m' odd."""
    from rayuela_tpu.search.scan_codes_pallas import (build_luts,
                                                      pack_codes,
                                                      xla_lut_scan)
    d, m, h, n, nq, k = 20, 5, 16, 3210, 11, 33
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    T = build_luts(jnp.asarray(C), jnp.asarray(Q), pq=True, d=d)
    packed = pack_codes(jnp.asarray(B))
    sc, ids, flagged = _run_kernel(T, packed, k=k, r=24, bq=8,
                                   tile=1024, lut_dtype=jnp.float32)
    assert not np.asarray(flagged).any()
    assert (np.asarray(ids) < n).all() and (np.asarray(ids) >= 0).all()
    ref_s, _ = xla_lut_scan(T, jnp.asarray(B), k)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_s),
                               rtol=1e-4, atol=1e-3)


def test_search_codes_end_to_end_matches_decoded_search(rng):
    """Full front-end: PQ codes index == decoded-index search (true
    distances, identical ranking up to decode ties)."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    from rayuela_tpu.ops.qerror import reconstruct_pq
    d, m, h, n, nq, k = 32, 4, 16, 4000, 9, 25
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    dv, di = search_codes(idx, Q, k, interpret=True,
                          lut_dtype=jnp.float32)
    Xd = np.asarray(reconstruct_pq(C, B, d))
    D = ((np.asarray(Q)[:, None, :] - Xd[None]) ** 2).sum(-1)
    ref_d = np.sort(D, 1)[:, :k]
    np.testing.assert_allclose(np.asarray(dv), ref_d,
                               rtol=1e-4, atol=1e-3)
    picked = np.take_along_axis(D, np.asarray(di), axis=1)
    np.testing.assert_allclose(picked, np.asarray(dv),
                               rtol=1e-4, atol=1e-3)


def test_additive_requires_norms(rng):
    from rayuela_tpu.search.scan_codes_pallas import build_codes_index
    X, C, B = random_dataset(rng, d=16, n=100, m=3, h=16)
    with pytest.raises(ValueError, match="norms"):
        build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=False)


def test_adversarial_lane_overflow_is_flagged_and_repaired(rng):
    """Plant many near-ties of one query in a single lane; search_codes
    must return the exact LUT-score top-k anyway (flag + XLA rescan)."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    d, m, h, n, k = 16, 4, 16, 2048, 32
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    # make lane 0 of every tile hold the same (best) code row for q0
    best = rng.integers(0, h, m).astype(np.int32)
    for t in range(16):
        B[t * 128] = best
    from rayuela_tpu.ops.qerror import reconstruct_pq
    Q = np.asarray(reconstruct_pq(C, B, d))[0:1] + 0.0
    Q = np.concatenate([Q, rng.standard_normal((3, d)).astype(np.float32)])
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    dv, di = search_codes(idx, jnp.asarray(Q), k, r=8, tile=1024,
                          interpret=True, lut_dtype=jnp.float32)
    Xd = np.asarray(reconstruct_pq(C, B, d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dv), np.sort(D, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)


def test_codes_auto_config_valid_across_classes():
    """Every codes auto configuration must satisfy the kernels' static
    constraints, for both modes and all m' classes."""
    from rayuela_tpu.search.scan_codes_pallas import _codes_auto_config
    from rayuela_tpu.search.scan_pallas import LANES
    for k in (1, 10, 100, 512, 513, 1000, 3000):
        for nq in (1, 7, 128, 10_000):
            for pack in (False, True):
                for mode in ("lut", "decode"):
                    for mp in (None, 4, 8, 11, 12, 16, 17):
                        (r, bq, tile, keep, stage,
                         qsuper) = _codes_auto_config(
                            k, nq, pack, mode, mp)
                        rows = tile // LANES
                        assert rows & (rows - 1) == 0
                        assert bq >= 1
                        assert qsuper >= 1
                        assert not (stage and qsuper > 1)
                        if pack and keep:
                            assert (keep & (keep - 1) == 0
                                    and keep <= rows)
                            w = r + keep * max(1, stage)
                            assert w & (w - 1) == 0
                            if stage:
                                ks = keep * stage
                                assert ks & (ks - 1) == 0
                                assert keep < rows
                        else:
                            assert stage == 0
                            assert (r + rows) & (r + rows - 1) == 0


def test_segmented_overflow_is_flagged_and_repaired(rng, monkeypatch):
    """Segmented decode mode defers all per-segment flags to ONE host
    sync; a flagged (query, segment) taints the merged list, so the
    repair must rebuild that query exactly over ALL segments."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, k = 16, 4, 16, 4096, 32
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    best = rng.integers(0, h, m).astype(np.int32)
    for t in range(16):           # overflow lane 0 of SEGMENT 0 only
        B[t * 128] = best
    from rayuela_tpu.ops.qerror import reconstruct_pq
    Q = np.asarray(reconstruct_pq(C, B, d))[0:1] + 0.0
    Q = np.concatenate([Q, rng.standard_normal((3, d)).astype(np.float32)])
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    monkeypatch.setattr(scp, "_DECODE_SEG", 2048)
    dv, di = scp.search_codes(idx, jnp.asarray(Q), k, r=8, tile=1024,
                              interpret=True, lut_dtype=jnp.float32)
    Xd = np.asarray(reconstruct_pq(C, B, d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dv), np.sort(D, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)
    picked = np.take_along_axis(D, np.asarray(di), axis=1)
    np.testing.assert_allclose(picked, np.asarray(dv), rtol=1e-4,
                               atol=1e-3)


def test_kernel_prered_matches_xla_lut_scan(rng):
    """keep pre-reduction: same scores as the XLA oracle when nothing
    overflows the per-tile certificate."""
    from rayuela_tpu.search.scan_codes_pallas import (build_luts,
                                                      pack_codes,
                                                      xla_lut_scan)
    d, m, h, n, nq, k = 32, 4, 16, 30_000, 10, 40
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    T = build_luts(jnp.asarray(C), jnp.asarray(Q), pq=True, d=d)
    packed = pack_codes(jnp.asarray(B))
    sc, ids, flagged = _run_kernel(T, packed, k=k, r=28, bq=8,
                                   tile=1024, lut_dtype=jnp.float32,
                                   pack=True, keep=4)
    s64 = _lut_brute(T, B)
    picked = np.take_along_axis(s64, np.asarray(ids), axis=1)
    ok = ~np.asarray(flagged)
    assert ok.any()
    ref = np.sort(s64, axis=1)[:, :k]
    np.testing.assert_allclose(picked[ok], ref[ok], rtol=3e-3,
                               atol=3e-3)


def test_decode_mode_pq_matches_brute(rng):
    """In-kernel-decode codes scan (PQ): true distances vs numpy."""
    from rayuela_tpu.search.scan_codes_pallas import (CodesIndex,
                                                      build_codes_index,
                                                      search_codes)
    from rayuela_tpu.ops.qerror import reconstruct_pq
    d, m, h, n, nq, k = 32, 4, 16, 20_000, 9, 30
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    dists, ids = search_codes(idx, jnp.asarray(Q), k, interpret=True,
                              mode="decode", lut_dtype=jnp.float32,
                              r=28, bq=8, tile=1024, keep=4)
    Xd = np.asarray(reconstruct_pq(jnp.asarray(C), jnp.asarray(B), d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(ids), axis=1)
    ref = np.sort(D, axis=1)[:, :k]
    np.testing.assert_allclose(picked, ref, rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(dists), ref, rtol=3e-3,
                               atol=3e-3)


def test_decode_mode_staged_matches_per_tile(rng):
    """Decode-mode staged buffer merge keeps mathematically the same
    top-r as the per-tile merge: identical ids/values when unflagged."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    d, m, h, n, nq, k = 32, 4, 16, 20_000, 9, 30   # ragged: 20 tiles
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    kw = dict(interpret=True, mode="decode", lut_dtype=jnp.float32,
              bq=8, tile=1024, keep=2)
    d1, i1 = search_codes(idx, jnp.asarray(Q), k, r=14, stage=0, **kw)
    d2, i2 = search_codes(idx, jnp.asarray(Q), k, r=16, stage=8, **kw)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-6, atol=1e-6)


def test_decode_mode_staged_validation(rng):
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    X, C, B = random_dataset(rng, d=16, n=4096, m=4, h=16, pq=True)
    Q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True,
                            d=16)
    kw = dict(interpret=True, mode="decode", bq=4, tile=1024)
    with pytest.raises(ValueError):        # stage needs keep
        search_codes(idx, Q, 8, r=16, keep=0, stage=8, **kw)
    with pytest.raises(ValueError):        # r+keep*stage not pow2
        search_codes(idx, Q, 8, r=14, keep=2, stage=8, **kw)
    with pytest.raises(ValueError):        # keep*stage not pow2
        search_codes(idx, Q, 8, r=26, keep=2, stage=3, **kw)


def test_decode_mode_additive_with_norms_matches_lut_mode(rng):
    """Additive + quantized-norms byte: decode mode == LUT mode (same
    score model, f32 operands)."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    d, m, h, n, nq, k = 24, 3, 16, 8_000, 7, 25
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    nrm_cb = np.sort(rng.random(8).astype(np.float32) * 20)
    nrm_codes = rng.integers(0, 8, n).astype(np.int32)
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B),
                            norms_cbook=jnp.asarray(nrm_cb),
                            norms_codes=jnp.asarray(nrm_codes))
    d1, i1 = search_codes(idx, jnp.asarray(Q), k, interpret=True,
                          mode="decode", lut_dtype=jnp.float32,
                          r=28, bq=8, tile=1024, keep=4)
    d2, i2 = search_codes(idx, jnp.asarray(Q), k, interpret=True,
                          mode="lut", lut_dtype=jnp.float32,
                          r=28, bq=8, tile=1024, keep=4, pack=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-3)


def test_decode_mode_segmented_matches_single(rng, monkeypatch):
    """Bases beyond the packed-id range run in segments with an exact
    host merge — force tiny segments and compare with one-shot."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, nq, k = 16, 4, 16, 5000, 6, 20
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    kw = dict(interpret=True, mode="decode", lut_dtype=jnp.float32,
              r=28, bq=8, tile=1024, keep=4)
    d1, i1 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    monkeypatch.setattr(scp, "_DECODE_SEG", 2048)
    d2, i2 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    # same top-k VALUES; ids may permute among decode ties across
    # segment boundaries — but every id must score its reported rank
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-3)
    from rayuela_tpu.ops.qerror import reconstruct_pq
    Xd = np.asarray(reconstruct_pq(jnp.asarray(C), jnp.asarray(B), d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(i2), axis=1)
    np.testing.assert_allclose(picked, np.asarray(d2), rtol=1e-4,
                               atol=1e-3)


def test_decode_mode_qsuper_matches_single(rng):
    """Two-level query blocking (decode once per super-block) returns
    identical ids/values to qsuper=1 — the selection math per
    sub-block is unchanged, only decode reuse differs. Also exercises
    ragged nq vs the bq*qsuper padding."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    d, m, h, n, nq, k = 32, 4, 16, 20_000, 9, 30
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    kw = dict(interpret=True, mode="decode", lut_dtype=jnp.float32,
              r=28, bq=8, tile=1024, keep=4)
    d1, i1 = search_codes(idx, jnp.asarray(Q), k, qsuper=1, **kw)
    for qs in (2, 4):
        d2, i2 = search_codes(idx, jnp.asarray(Q), k, qsuper=qs, **kw)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-6, atol=1e-6)


def test_decode_mode_qsuper_additive_with_norms(rng):
    """qsuper with the quantized-norms byte: true distances vs brute
    force through the norms-table score model."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    from rayuela_tpu.ops.qerror import reconstruct
    d, m, h, n, nq, k = 24, 3, 16, 8_000, 6, 25
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    nrm_cb = np.sort(rng.random(8).astype(np.float32) * 20)
    nrm_codes = rng.integers(0, 8, n).astype(np.int32)
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B),
                            norms_cbook=jnp.asarray(nrm_cb),
                            norms_codes=jnp.asarray(nrm_codes))
    dq, iq = search_codes(idx, jnp.asarray(Q), k, interpret=True,
                          mode="decode", lut_dtype=jnp.float32,
                          r=28, bq=8, tile=1024, keep=4, qsuper=2)
    Xd = np.asarray(reconstruct(jnp.asarray(C), jnp.asarray(B)))
    s = (-2.0 * Q @ Xd.T + nrm_cb[nrm_codes][None, :]
         + (Q ** 2).sum(-1, keepdims=True))
    ref = np.sort(s, axis=1)[:, :k]
    picked = np.take_along_axis(s, np.asarray(iq), axis=1)
    np.testing.assert_allclose(picked, ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dq), ref, rtol=1e-4,
                               atol=1e-3)


def test_decode_mode_qsuper_stage_mutually_exclusive(rng):
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    X, C, B = random_dataset(rng, d=16, n=4096, m=4, h=16, pq=True)
    Q = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True,
                            d=16)
    with pytest.raises(ValueError):
        search_codes(idx, Q, 8, interpret=True, mode="decode", bq=4,
                     tile=1024, r=16, keep=2, stage=8, qsuper=2)


def test_segmented_multiflag_exact_kernel_rescue(rng, monkeypatch):
    """Flags at 2+ segments repair through the per-segment exact
    kernel, NOT the all-segments XLA gather scan (stubbed to fail):
    the certificate is per (query, segment) and only tainted segments
    re-scan (VERDICT r2 item 5)."""
    from rayuela_tpu.ops.qerror import reconstruct_pq
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, k = 16, 4, 16, 8192, 32
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    best = rng.integers(0, h, m).astype(np.int32)
    for t in range(16):            # overflow lane 0 of segment 0
        B[t * 128] = best
    for t in range(16):            # ... and of segment 2
        B[2 * 2048 + t * 128] = best
    Q = np.asarray(reconstruct_pq(C, B, d))[0:1] + 0.0
    Q = np.concatenate([Q, rng.standard_normal((3, d)).astype(np.float32)])
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    monkeypatch.setattr(scp, "_DECODE_SEG", 2048)

    def boom(*a, **kw):
        raise AssertionError("XLA all-segments fallback entered")

    monkeypatch.setattr(scp, "xla_lut_scan", boom)
    dv, di = scp.search_codes(idx, jnp.asarray(Q), k, r=8, tile=1024,
                              interpret=True, lut_dtype=jnp.float32)
    Xd = np.asarray(reconstruct_pq(C, B, d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dv), np.sort(D, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)
    picked = np.take_along_axis(D, np.asarray(di), axis=1)
    np.testing.assert_allclose(picked, np.asarray(dv), rtol=1e-4,
                               atol=1e-3)
    # no duplicate ids: masking the tainted segment before the merge
    # must keep the union disjoint
    ids = np.asarray(di)
    for row in ids:
        assert len(set(row.tolist())) == len(row)


def test_decode_twopass_matches_brute(rng):
    """Two-pass decode kernel (tile-major decode-once pass + candidate
    merge pass): true distances vs numpy, and identical ids to the
    one-pass decode kernel when neither flags."""
    from rayuela_tpu.ops.qerror import reconstruct_pq
    from rayuela_tpu.search.scan_codes_pallas import (
        build_codes_index, search_codes)
    d, m, h, n, nq, k = 32, 4, 16, 20_000, 9, 30
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    kw = dict(interpret=True, mode="decode", lut_dtype=jnp.float32,
              bq=8, tile=1024, keep=4)
    d1, i1 = search_codes(idx, jnp.asarray(Q), k, r=28, **kw)
    d2, i2 = search_codes(idx, jnp.asarray(Q), k, r=16, twopass=True,
                          **kw)
    Xd = np.asarray(reconstruct_pq(jnp.asarray(C), jnp.asarray(B), d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    ref = np.sort(D, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=3e-3,
                               atol=3e-3)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_decode_twopass_norms_byte_and_flags(rng):
    """Two-pass kernel with the additive norms-byte path, plus an
    adversarial overflow (many near-ties in one lane) that must flag
    and repair to exactness."""
    from rayuela_tpu.ops.qerror import reconstruct
    from rayuela_tpu.search.norms import (get_norms_codebook,
                                          quantize_norms)
    from rayuela_tpu.search.scan_codes_pallas import (
        build_codes_index, search_codes)
    d, m, h, n, k = 16, 4, 16, 4096, 24
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h)
    best = rng.integers(0, h, m).astype(np.int32)
    for t in range(8):
        B[t * 128] = best             # lane-0 pileup
    Cj, Bj = jnp.asarray(C), jnp.asarray(B)
    Q = np.asarray(reconstruct(Cj, Bj))[0:1]
    Q = np.concatenate([Q, rng.standard_normal((3, d)).astype(np.float32)])
    import jax
    key = jax.random.PRNGKey(0)
    ncodes, ncbook = get_norms_codebook(key, Cj, Bj, h=h)
    bcodes, _ = quantize_norms(Cj, Bj, ncbook)
    idx = build_codes_index(Cj, Bj, pq=False, norms_cbook=ncbook,
                            norms_codes=bcodes)
    dv, di = search_codes(idx, jnp.asarray(Q), k, twopass=True,
                          interpret=True, mode="decode",
                          lut_dtype=jnp.float32, r=16, bq=4, tile=1024,
                          keep=2)
    # oracle: decoded scores with the QUANTIZED norms replacing |x|^2
    Xd = np.asarray(reconstruct(Cj, Bj))
    nt = np.asarray(ncbook).reshape(-1)[np.asarray(bcodes)]
    S = (-2.0 * Q @ Xd.T + nt[None, :]
         + (Q * Q).sum(1, keepdims=True))
    picked = np.take_along_axis(S, np.asarray(di), axis=1)
    np.testing.assert_allclose(np.asarray(dv), np.sort(S, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(picked, np.asarray(dv), rtol=1e-4,
                               atol=1e-3)


def test_fused_inline_rescue_repairs_in_graph(rng):
    """The fused single-segment wrapper rescues certificate-flagged
    queries IN-GRAPH (one dispatch; mirrors
    scan_pallas._scan_premin_inline): the residual flag vector must be
    all-False and the results exact, for a pileup the bare kernel
    provably flags."""
    from rayuela_tpu.ops.qerror import reconstruct_pq
    from rayuela_tpu.search.scan_codes_pallas import (
        _scan_segment_fused, build_codes_index,
        pallas_scan_codes_decode_topk)
    d, m, h, n, k = 16, 4, 16, 2048, 32
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    best = rng.integers(0, h, m).astype(np.int32)
    for t in range(16):
        B[t * 128] = best             # lane-0 pileup for q0
    Q = np.asarray(reconstruct_pq(C, B, d))[0:1] + 0.0
    Q = np.concatenate([Q, rng.standard_normal((3, d)).astype(np.float32)])
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    Cf, nrm = idx.decode_operands(d, jnp.float32)
    kw = dict(k=k, pq=True, r=8, bq=4, tile=1024, keep=0)
    # the bare kernel at this shallow config must flag the pileup...
    _, _, fl0 = pallas_scan_codes_decode_topk(
        jnp.asarray(Q), Cf, nrm, idx.packed, verify=True,
        interpret=True, op_dtype=jnp.float32, **kw)
    assert np.asarray(fl0).any()
    # ...and the fused wrapper must repair it in-graph
    sq, di, fl, hard = _scan_segment_fused(
        jnp.asarray(Q), Cf, nrm, idx.packed, rows2=0, twopass=False,
        qsuper=1, stage=0, op_dtype=jnp.float32, vmem_mb=None,
        interpret=True, **kw)
    assert not np.asarray(fl).any()
    assert not np.asarray(hard).any()
    Xd = np.asarray(reconstruct_pq(C, B, d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(sq), np.sort(D, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)
    picked = np.take_along_axis(D, np.asarray(di), axis=1)
    np.testing.assert_allclose(picked, np.asarray(sq), rtol=1e-4,
                               atol=1e-3)


def test_k_exceeding_n_and_buffer_capacity_clamps(rng):
    """k > n must clamp to n, and k beyond the deepest kernel buffer
    (96*128) must fall back to the exact XLA scan instead of raising
    (verify-skill probe; the reference protocol caps at knn=1000)."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    d, m, h, n = 16, 4, 16, 500
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    dv, di = search_codes(idx, Q, n + 50, interpret=True,
                          lut_dtype=jnp.float32)
    assert dv.shape == (3, n) and di.shape == (3, n)
    assert np.isfinite(np.asarray(dv)).all()
    assert (np.asarray(di) >= 0).all() and (np.asarray(di) < n).all()
    # every row id exactly once (the full ranking of the base)
    assert all(len(set(row)) == n for row in np.asarray(di))


def test_k_beyond_kernel_buffer_uses_xla_fallback(rng):
    """n large enough that min(k, n) still exceeds 96*128: the XLA
    fallback must produce the exact ranking prefix."""
    from rayuela_tpu.search.scan_codes_pallas import (build_codes_index,
                                                      search_codes)
    from rayuela_tpu.ops.qerror import reconstruct_pq
    d, m, h, n, k = 8, 2, 8, 13_000, 12_500
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    dv, di = search_codes(idx, Q, k, interpret=True,
                          lut_dtype=jnp.float32)
    assert dv.shape == (2, k)
    Xd = np.asarray(reconstruct_pq(C, B, d))
    D = ((np.asarray(Q)[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dv), np.sort(D, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)


def test_xla_fallback_tiles_query_and_base(rng):
    """The big-k XLA oracle must tile over query blocks AND base
    segments with an exact top-k merge (a monolithic xla_lut_scan
    materializes (nq, n, m') and OOMs at protocol scale — ADVICE r3);
    force multiple tiles on both axes and check against the
    single-call oracle."""
    from rayuela_tpu.search.scan_codes_pallas import (
        _xla_lut_scan_tiled, build_codes_index, build_luts,
        unpack_codes, xla_lut_scan)
    d, m, h, n, k = 8, 2, 8, 1_000, 700
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = jnp.asarray(rng.standard_normal((5, d)).astype(np.float32))
    idx = build_codes_index(jnp.asarray(C), jnp.asarray(B), pq=True, d=d)
    s, i = _xla_lut_scan_tiled(idx, Q, k, d, jnp.float32,
                               qblock=2, seg=300)
    T = build_luts(idx.C, Q, pq=True, d=d)
    s0, i0 = xla_lut_scan(T, unpack_codes(idx.packed, m), k,
                          lut_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0),
                               rtol=1e-5, atol=1e-5)
    # ids may differ on exact score ties; each returned id's true
    # score must equal the returned score
    from rayuela_tpu.ops.qerror import reconstruct_pq
    Xd = np.asarray(reconstruct_pq(C, B, d))
    Dfull = ((np.asarray(Q)[:, None, :] - Xd[None]) ** 2).sum(-1)
    q2 = (np.asarray(Q) ** 2).sum(1, keepdims=True)
    picked = np.take_along_axis(Dfull, np.asarray(i), axis=1)
    np.testing.assert_allclose(picked, np.asarray(s) + q2,
                               rtol=1e-4, atol=1e-4)


def test_lut_mode_segmented_matches_single(rng, monkeypatch):
    """LUT mode is the documented fallback for shards beyond the
    packed-id range, but its fused front-end is unsegmented — big
    bases must recurse per segment with an exact merge (round-4 fix:
    the unsegmented call crashed at n=1e8 with a reshape error)."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, nq, k = 16, 4, 16, 5000, 6, 20
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    kw = dict(interpret=True, mode="lut", lut_dtype=jnp.float32,
              r=24, bq=8, tile=1024)
    d1, i1 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    monkeypatch.setattr(scp, "_DECODE_SEG", 2048)
    d2, i2 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-3)
    # every reported id must score its reported rank exactly
    from rayuela_tpu.ops.qerror import reconstruct_pq
    Xd = np.asarray(reconstruct_pq(jnp.asarray(C), jnp.asarray(B), d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(i2), axis=1)
    np.testing.assert_allclose(picked, np.asarray(d2), rtol=1e-4,
                               atol=1e-3)


def test_segmented_norms_byte_matches_single(rng, monkeypatch):
    """Additive (norms-byte) index through forced tiny segments: the
    norms byte rides IN the packed word, so row slicing must keep it
    aligned and every segment must add the same norms-table term."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, nq, k = 16, 3, 16, 5000, 6, 20
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=False)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    from rayuela_tpu.ops.qerror import reconstruct
    Xd = np.asarray(reconstruct(jnp.asarray(C), jnp.asarray(B)))
    x2 = (Xd ** 2).sum(-1)
    # 16-entry norms codebook + nearest-entry codes
    ncb = np.quantile(x2, np.linspace(0, 1, 16)).astype(np.float32)
    ncodes = np.argmin(np.abs(x2[:, None] - ncb[None]), axis=1)
    idx = scp.build_codes_index(
        jnp.asarray(C), jnp.asarray(B), pq=False, d=d,
        norms_cbook=jnp.asarray(ncb),
        norms_codes=jnp.asarray(ncodes, jnp.int32))
    kw = dict(interpret=True, mode="decode", lut_dtype=jnp.float32,
              r=28, bq=8, tile=1024, keep=4)
    d1, i1 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    monkeypatch.setattr(scp, "_DECODE_SEG", 2048)
    d2, i2 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-3)
    # rank-exactness vs the norms-byte scoring convention:
    # -2 q.x_hat + ncb[ncode] + |q|^2
    D = (-2 * Q @ Xd.T + ncb[ncodes][None]
         + (Q ** 2).sum(-1, keepdims=True))
    picked = np.take_along_axis(D, np.asarray(i2), axis=1)
    np.testing.assert_allclose(picked, np.asarray(d2), rtol=1e-4,
                               atol=1e-3)


def test_xla_tiled_unpacks_each_segment_once(rng, monkeypatch):
    """ADVICE r4: the tiled oracle must slice + unpack each base
    segment exactly ONCE (segment loop outer), not once per query
    block — the redundancy was ~nq/qblock = ~78x at nq=1e4."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, k = 8, 2, 8, 1000, 50
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = jnp.asarray(rng.standard_normal((6, d)).astype(np.float32))
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    calls = []
    orig = scp.unpack_codes

    def spy(p, mp):
        calls.append(int(p.shape[0]))
        return orig(p, mp)

    monkeypatch.setattr(scp, "unpack_codes", spy)
    s, i = scp._xla_lut_scan_tiled(idx, Q, k, d, jnp.float32,
                                   qblock=2, seg=300)
    assert len(calls) == -(-n // 300), calls   # one unpack per segment
    assert max(calls) <= 300                   # never the whole base
    monkeypatch.setattr(scp, "unpack_codes", orig)
    T = scp.build_luts(idx.C, Q, pq=True, d=d)
    s0, i0 = scp.xla_lut_scan(T, scp.unpack_codes(idx.packed, m), k,
                              lut_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0),
                               rtol=1e-5, atol=1e-5)


def test_search_codes_streamed_reuses_index_across_shards(rng,
                                                          monkeypatch):
    """ADVICE r4: equal-shape shards must reuse ONE shard-local
    CodesIndex (its _seg_fns trace cache is per-instance — a fresh
    index per shard re-paid the ~0.7-1.0 s trace/lower cost)."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, nq, k = 16, 4, 16, 4500, 4, 10
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    kw = dict(interpret=True, lut_dtype=jnp.float32, r=28, bq=8,
              tile=1024, keep=4)
    d1, i1 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    count = {"n": 0}
    orig_cls = scp.CodesIndex

    class Spy(orig_cls):
        def __init__(self, *a, **kwa):
            count["n"] += 1
            super().__init__(*a, **kwa)

    monkeypatch.setattr(scp, "CodesIndex", Spy)
    d2, i2 = scp.search_codes_streamed(
        jnp.asarray(C), np.asarray(idx.packed), jnp.asarray(Q), k,
        pq=True, d=d, shard_n=1500, **kw)
    assert count["n"] == 1                # 3 equal shards, one index
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-3)


def test_search_codes_streamed_matches_resident(rng, tmp_path):
    """Host-resident packed codes streamed in shards == one resident
    index, exactly (values; ids rank-exact) — incl. from an on-disk
    np.memmap, the beyond-HBM deployment shape."""
    from rayuela_tpu.search import scan_codes_pallas as scp
    d, m, h, n, nq, k = 16, 4, 16, 5000, 6, 20
    X, C, B = random_dataset(rng, d=d, n=n, m=m, h=h, pq=True)
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    idx = scp.build_codes_index(jnp.asarray(C), jnp.asarray(B),
                                pq=True, d=d)
    kw = dict(interpret=True, lut_dtype=jnp.float32,
              r=28, bq=8, tile=1024, keep=4)
    d1, i1 = scp.search_codes(idx, jnp.asarray(Q), k, **kw)
    packed_host = np.asarray(idx.packed)
    d2, i2 = scp.search_codes_streamed(
        jnp.asarray(C), packed_host, jnp.asarray(Q), k, pq=True, d=d,
        shard_n=1500, **kw)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-3)
    # memmap source (on-disk codes)
    f = tmp_path / "codes.packed"
    packed_host.tofile(f)
    mm = np.memmap(f, dtype=np.int32, mode="r",
                   shape=packed_host.shape)
    d3, i3 = scp.search_codes_streamed(
        jnp.asarray(C), mm, jnp.asarray(Q), k, pq=True, d=d,
        shard_n=1500, **kw)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i2))
    # rank-exactness of streamed ids
    from rayuela_tpu.ops.qerror import reconstruct_pq
    Xd = np.asarray(reconstruct_pq(jnp.asarray(C), jnp.asarray(B), d))
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(i2), axis=1)
    np.testing.assert_allclose(picked, np.asarray(d2), rtol=1e-4,
                               atol=1e-3)
