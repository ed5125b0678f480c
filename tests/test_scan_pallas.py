"""Pallas fused scan+top-k kernel — cross-implementation equivalence
with brute force / the XLA scan path, in interpret mode on CPU
(SURVEY.md §4: 'interpret-mode Pallas on CPU')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def brute(Q, Xd, k):
    D = ((Q[:, None, :].astype(np.float64)
          - Xd[None].astype(np.float64)) ** 2).sum(-1)
    return np.sort(D, 1)[:, :k], np.argsort(D, 1)[:, :k]


def run(Q, Xd, x2=None, **kw):
    from rayuela_tpu.search.scan_pallas import pallas_scan_topk
    if x2 is None:
        x2 = jnp.sum(jnp.asarray(Xd) ** 2, axis=-1)
    return pallas_scan_topk(jnp.asarray(Q), jnp.asarray(Xd), x2,
                            interpret=True, **kw)


def test_matches_brute_force(rng):
    nq, n, d, k = 12, 5000, 96, 50
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids, flagged = run(Q, Xd, k=k, r=48, bq=8, tile=2048)
    ref_d, ref_i = brute(Q, Xd, k)
    assert not np.asarray(flagged).any()
    np.testing.assert_array_equal(np.asarray(ids), ref_i)
    np.testing.assert_allclose(np.asarray(dists), ref_d,
                               rtol=1e-4, atol=1e-3)


def test_ragged_sizes(rng):
    """n not a multiple of tile, nq not a multiple of bq, d not a
    multiple of 128."""
    nq, n, d, k = 11, 3210, 40, 33
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids, flagged = run(Q, Xd, k=k, r=24, bq=8, tile=1024)
    ref_d, ref_i = brute(Q, Xd, k)
    assert not np.asarray(flagged).any()
    np.testing.assert_array_equal(np.asarray(ids), ref_i)


def test_norm_term_override(rng):
    """LSQ-style quantized norms replace |x|^2 in the score."""
    nq, n, d, k = 6, 2000, 32, 20
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    fake_norms = rng.random(n).astype(np.float32) * 10
    dists, ids, flagged = run(Q, Xd, x2=jnp.asarray(fake_norms),
                              k=k, r=24, bq=8, tile=1024)
    D = (-2.0 * Q @ Xd.T + fake_norms[None, :]
         + (Q ** 2).sum(-1, keepdims=True))
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.argsort(D, 1)[:, :k])


def test_adversarial_lane_overflow_is_flagged(rng):
    """Base ordered so the global top-k concentrates in one lane
    (position mod 128): the kernel must flag affected queries rather
    than silently return wrong ids."""
    nq, n, d = 4, 4096, 16
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 100.0
    # plant 30 near-duplicates of query 0 at positions = 0 mod 128
    for t in range(30):
        Xd[t * 128] = Q[0] + 1e-3 * rng.standard_normal(d)
    r = 8   # shallow buffer so the planted lane overflows (30 > 8)
    dists, ids, flagged = run(Q, Xd, k=32, r=r, bq=4, tile=1024)
    flagged = np.asarray(flagged)
    assert flagged[0], "query 0 overflowed lane 0 and must be flagged"
    # unaffected queries stay exact
    ref_d, ref_i = brute(Q, Xd, 32)
    for q in range(1, nq):
        if not flagged[q]:
            np.testing.assert_array_equal(np.asarray(ids)[q], ref_i[q])


def test_decode_base_matches_reconstruct(rng):
    from rayuela_tpu.ops.qerror import reconstruct
    from rayuela_tpu.search.scan_pallas import decode_base
    from tests.conftest import random_dataset
    X, C, B = random_dataset(rng, d=24, n=700, m=3, h=16)
    Xd, x2 = decode_base(jnp.asarray(C), jnp.asarray(B), chunk=256)
    ref = np.asarray(reconstruct(C, B))
    np.testing.assert_allclose(np.asarray(Xd), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), (ref ** 2).sum(-1),
                               rtol=1e-4, atol=1e-3)


def test_k_validation(rng):
    Q = rng.standard_normal((4, 32)).astype(np.float32)
    Xd = rng.standard_normal((1000, 32)).astype(np.float32)
    with pytest.raises(ValueError):
        run(Q, Xd, k=24 * 128 + 1, r=24, bq=4, tile=1024)


def test_segmented_decoded_warns_on_dropped_modes(rng, monkeypatch):
    """ADVICE r4: the segmented decoded path (n beyond the pack32
    row-id range) cannot honor premin/score16 (per-call machinery) —
    it must WARN when they were explicitly requested instead of
    silently discarding them, and results must stay exact."""
    import warnings

    from rayuela_tpu.search import scan_pallas as sp
    n, d, nq, k = 3000, 16, 4, 10
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    Xj = jnp.asarray(Xd)
    idx = sp.LinscanIndex(Xj, jnp.sum(Xj * Xj, -1))
    Q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))
    monkeypatch.setattr(sp, "_SEG_DECODED", 1024)   # force segmenting
    with pytest.warns(UserWarning, match="premin"):
        dv, di = sp.search(idx, Q, k, r=14, bq=8, tile=1024,
                           interpret=True, pack=True, premin=1)
    D = ((np.asarray(Q)[:, None, :] - Xd[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dv), np.sort(D, 1)[:, :k],
                               rtol=1e-4, atol=1e-3)
    # implicit (auto-config) modes stay silent on the segmented path
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dv2, _ = sp.search(idx, Q, k, r=14, bq=8, tile=1024,
                           interpret=True, pack=True)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(dv),
                               rtol=1e-4, atol=1e-3)


def test_search_streamed_matches_single_shot(rng):
    """Shard-streamed search == one-shot search, exactly."""
    from rayuela_tpu.search.scan_pallas import (build_index, search,
                                                search_streamed)
    from tests.conftest import random_dataset
    X, C, B = random_dataset(rng, d=24, n=3000, m=3, h=16)
    Q = jnp.asarray(rng.standard_normal((10, 24)).astype(np.float32))
    idx = build_index(jnp.asarray(C), jnp.asarray(B), d=24)
    dv1, di1 = search(idx, Q, 25, interpret=True)
    dv2, di2 = search_streamed(jnp.asarray(C), np.asarray(B), Q, 25,
                               d=24, shard_size=1100, interpret=True)
    # same top-k VALUES (ids can permute among duplicate-decode ties —
    # with h=16 codes many base rows decode identically)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(dv1),
                               rtol=1e-5, atol=1e-4)
    # and every returned id's true distance matches its reported rank
    from rayuela_tpu.ops.qerror import reconstruct
    Xd = np.asarray(reconstruct(C, B))
    D = ((np.asarray(Q)[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(di2), axis=1)
    np.testing.assert_allclose(picked, np.asarray(dv2),
                               rtol=1e-4, atol=1e-3)


def test_pack32_exact_on_coarse_data(rng):
    """Packed selection: on small-integer data every distance fits the
    truncated value bits exactly, so the top-k VALUES must equal brute
    force (ids may permute among genuinely tied distances)."""
    nq, n, d, k = 8, 3000, 8, 40
    Q = rng.integers(-1, 2, (nq, d)).astype(np.float32)
    Xd = rng.integers(-1, 2, (n, d)).astype(np.float32)
    dists, ids, flagged = run(Q, Xd, k=k, r=24, bq=8, tile=1024,
                              pack=True)
    ref_d, _ = brute(Q, Xd, k)
    dists, ids = np.asarray(dists), np.asarray(ids)
    np.testing.assert_allclose(dists[~np.asarray(flagged)],
                               ref_d[~np.asarray(flagged)], atol=1e-4)
    # returned ids really score their reported (truncated) distances
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, ids, axis=1)
    np.testing.assert_allclose(picked, dists, atol=1e-4)


def test_pack32_gaussian_within_truncation(rng):
    """On Gaussian data pack32 returns the exact top-k of the
    truncated scores — true distances of returned ids must be within
    the ~2^-10 relative truncation of the true top-k curve, and ids
    must be valid."""
    nq, n, d, k = 6, 5000, 32, 50
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids, flagged = run(Q, Xd, k=k, r=24, bq=8, tile=1024,
                              pack=True)
    ids = np.asarray(ids)
    assert (ids >= 0).all() and (ids < n).all()
    # no duplicate ids per query (packed keys are unique)
    for q in range(nq):
        assert len(set(ids[q])) == k
    ref_d, _ = brute(Q, Xd, k)
    D = ((Q[:, None, :].astype(np.float64) - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, ids, axis=1)
    np.testing.assert_allclose(picked, ref_d, rtol=3e-3, atol=3e-3)
    # reported dists are lower-bound truncations of the true distances
    dd = np.asarray(dists)
    assert (dd <= picked + 1e-3).all()


def test_qbias_matches_brute_force(rng):
    """qbias mode (|q|^2 folded in-kernel, scores clamped >= 0, keys a
    plain bitcast) returns the exact top-k up to key truncation, on
    every packed kernel variant — including planted zero-distance hits
    (the clamp path) and the premin in-graph rescue."""
    nq, n, d, k = 16, 3 * 2048 + 17, 32, 48
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    Xd[5], Xd[1234] = Q[0], Q[1]          # exact duplicates: dist 0
    ref_d, _ = brute(Q, Xd, k)
    ref_d = np.maximum(ref_d, 0.0)
    for kw in (dict(r=16, bq=128, tile=2048, keep=2, stage=8),
               dict(r=14, bq=128, tile=2048, keep=2),
               dict(r=48, bq=128, tile=2048)):
        dists, ids, flagged = run(Q, Xd, k=k, pack=True, qbias=True,
                                  **kw)
        ok = ~np.asarray(flagged)
        got = np.sort(np.asarray(dists), 1)
        np.testing.assert_allclose(got[ok], ref_d[ok], atol=2e-3)
        assert float(np.min(np.asarray(dists))) == 0.0   # clamped hits
        # ids score their reported truncated distances
        D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
        picked = np.take_along_axis(D, np.asarray(ids), axis=1)
        np.testing.assert_allclose(np.asarray(dists), picked, atol=2e-3)

    from rayuela_tpu.search.scan_pallas import _scan_premin_inline
    d2, i2, f2 = _scan_premin_inline(
        jnp.asarray(Q), jnp.asarray(Xd),
        jnp.sum(jnp.asarray(Xd) ** 2, -1), k=k, r=16, bq=128,
        tile=2048, keep=2, stage=8, premin=2, nr=16, interpret=True,
        qbias=True)
    ok = ~np.asarray(f2)
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1)[ok],
                               ref_d[ok], atol=2e-3)


def test_prered_topk_equals_sorted_head(rng):
    """The discard-half reduction == per-lane full sort's smallest
    ``keep``, sorted descending, and the discard-min == the
    (keep+1)-th smallest — for every (rows, keep) shape class."""
    from rayuela_tpu.search.scan_pallas import _prered_topk
    for rows, keep in [(8, 2), (8, 4), (16, 4), (32, 2), (32, 4),
                       (32, 8), (4, 4), (16, 16)]:
        kv = rng.integers(-2**31, 2**31 - 1, (rows, 16, 8),
                          dtype=np.int32)
        out, dmin = jax.jit(
            lambda v: _prered_topk(v, keep))(jnp.asarray(kv))
        srt = np.sort(kv, axis=0)
        ref = srt[:keep][::-1]                       # keep smallest, desc
        np.testing.assert_array_equal(np.asarray(out), ref)
        if rows == keep:
            assert dmin is None
        else:
            np.testing.assert_array_equal(np.asarray(dmin), srt[keep])


def test_prered_matches_brute_force(rng):
    nq, n, d, k = 12, 50_000, 96, 50
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    dists, ids, flagged = run(Q, Xd, k=k, r=28, bq=8, tile=2048,
                              pack=True, keep=4)
    assert not np.asarray(flagged).any()
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(ids), axis=1)
    ref_d, _ = brute(Q, Xd, k)
    np.testing.assert_allclose(picked, ref_d, rtol=3e-3, atol=3e-3)
    for q in range(nq):
        assert len(set(np.asarray(ids)[q])) == k


def test_prered_per_tile_overflow_is_flagged(rng):
    """Plant more than ``keep`` of the top-k inside ONE (lane, tile):
    the per-tile count certificate must flag the query."""
    nq, n, d, keep = 3, 8192, 16, 2
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 100.0
    # 4 near-duplicates of query 0, same lane (64), same tile (first)
    for t in range(4):
        Xd[t * 128 + 64] = Q[0] + 1e-3 * rng.standard_normal(d)
    dists, ids, flagged = run(Q, Xd, k=8, r=14, bq=4, tile=1024,
                              pack=True, keep=keep)
    flagged = np.asarray(flagged)
    assert flagged[0], "per-tile overflow must be flagged"
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    for q in range(1, nq):
        if not flagged[q]:
            picked = np.take_along_axis(D[q:q+1], np.asarray(ids)[q:q+1],
                                        axis=1)
            np.testing.assert_allclose(
                picked[0], np.sort(D[q])[:8], rtol=3e-3, atol=3e-3)


def test_premin_unit_reduction(rng):
    """`_premin` keeps the min of each 2^premin-row window and its
    discard-min is the min over everything else."""
    from rayuela_tpu.search.scan_pallas import _premin
    for rows, p in [(8, 1), (16, 2), (32, 3)]:
        kv = rng.integers(-2**31, 2**31 - 1, (rows, 16, 8),
                          dtype=np.int32)
        out, disc = jax.jit(
            lambda v, p=p: _premin(v, p))(jnp.asarray(kv))
        w = 1 << p
        blocks = kv.reshape(rows // w, w, 16, 8)
        ref = blocks.min(axis=1)
        np.testing.assert_array_equal(np.asarray(out), ref)
        # discard-min = global min over non-survivors = 2nd-smallest of
        # the block that holds the global min, min'd across blocks with
        # every other block's full sorted tail... simplest oracle: min
        # over all elements that are NOT their block's min
        srt = np.sort(blocks, axis=1)
        ref_disc = srt[:, 1:].min(axis=(0, 1))
        np.testing.assert_array_equal(np.asarray(disc), ref_disc)


def test_premin_matches_brute_force_or_flags(rng):
    """End-to-end with the lossy pre-filter: every query is either
    bit-correct vs brute force or flagged by the certificate."""
    nq, n, d, k = 16, 60_000, 64, 20
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    for kw in (dict(r=14, keep=2, stage=0),
               dict(r=16, keep=2, stage=8)):
        dists, ids, flagged = run(Q, Xd, k=k, bq=8, tile=2048,
                                  pack=True, premin=2, **kw)
        flagged = np.asarray(flagged)
        assert not flagged.all()            # losses must be rare
        D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
        picked = np.take_along_axis(D, np.asarray(ids), axis=1)
        ref_d = np.sort(D, 1)[:, :k]
        for q in range(nq):
            if not flagged[q]:
                np.testing.assert_allclose(picked[q], ref_d[q],
                                           rtol=3e-3, atol=3e-3)
                assert len(set(np.asarray(ids)[q])) == k


def test_premin_loss_is_flagged(rng):
    """Plant two near-ties in one premin window (same lane, adjacent
    rows): the pairwise min drops one of them, and the certificate
    must flag the query."""
    nq, n, d = 2, 4096, 16
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 50.0
    # rows 0 and 1 of lane 5, tile 0: ids 5 and 133 — one premin=1
    # window; both are top-2 for query 0
    Xd[5] = Q[0] + 1e-3
    Xd[133] = Q[0] - 1e-3
    dists, ids, flagged = run(Q, Xd, k=8, r=14, bq=2, tile=1024,
                              pack=True, keep=2, premin=1)
    assert np.asarray(flagged)[0]


def test_search_premin_ladder_is_exact(rng):
    """`search` with a lossy premin config: flagged queries re-run
    through the exact kernel (then XLA), so the final result matches
    the premin=0 search exactly — even with planted same-window
    collisions that force premin losses."""
    from rayuela_tpu.search.scan_pallas import LinscanIndex, search
    nq, n, d, k = 8, 20_000, 32, 10
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 30.0
    for q in range(4):                  # half the queries lose a hit
        Xd[q * 512 + 7] = Q[q] + 1e-3
        Xd[q * 512 + 135] = Q[q] - 1e-3
    Xj, x2 = jnp.asarray(Xd), jnp.sum(jnp.asarray(Xd) ** 2, -1)
    idx = LinscanIndex(Xj, x2)
    kw = dict(r=14, bq=8, tile=1024, pack=True, keep=2)
    d0, i0 = search(idx, Q, k, interpret=True, premin=0, **kw)
    d1, i1 = search(idx, Q, k, interpret=True, premin=1, **kw)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))


def test_premin_validation(rng):
    Q = rng.standard_normal((4, 32)).astype(np.float32)
    Xd = rng.standard_normal((9000, 32)).astype(np.float32)
    with pytest.raises(ValueError):        # premin needs pack
        run(Q, Xd, k=8, r=16, bq=4, tile=1024, premin=1)
    with pytest.raises(ValueError):        # rows>>premin < keep
        run(Q, Xd, k=8, r=14, bq=4, tile=1024, pack=True, keep=2,
            premin=3)


def test_staged_merge_matches_per_tile_merge(rng):
    """stage>0 merges the running buffer every `stage` tiles instead of
    every tile — the candidate set it keeps is mathematically the same
    top-r, so when neither run flags, ids and values must be IDENTICAL
    (same packed total order)."""
    nq, n, d, k = 10, 50_000, 64, 50     # ragged: 25 tiles, stage=8
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    d1, i1, f1 = run(Q, Xd, k=k, r=14, bq=8, tile=2048, pack=True,
                     keep=2)
    d2, i2, f2 = run(Q, Xd, k=k, r=16, bq=8, tile=2048, pack=True,
                     keep=2, stage=8)
    assert not np.asarray(f1).any() and not np.asarray(f2).any()
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))


def test_staged_merge_overflow_is_flagged(rng):
    """The staged kernel's certificate must still catch per-tile
    overflows (same construction as the per-tile variant's test)."""
    nq, n, d, keep = 3, 16_384, 16, 2
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 100.0
    for t in range(4):
        Xd[t * 128 + 64] = Q[0] + 1e-3 * rng.standard_normal(d)
    dists, ids, flagged = run(Q, Xd, k=8, r=16, bq=4, tile=1024,
                              pack=True, keep=2, stage=8)
    flagged = np.asarray(flagged)
    assert flagged[0], "per-tile overflow must be flagged"
    D = ((Q[:, None, :] - Xd[None]) ** 2).sum(-1)
    for q in range(1, nq):
        if not flagged[q]:
            picked = np.take_along_axis(D[q:q+1],
                                        np.asarray(ids)[q:q+1], axis=1)
            np.testing.assert_allclose(
                picked[0], np.sort(D[q])[:8], rtol=3e-3, atol=3e-3)


def test_staged_merge_validation(rng):
    Q = rng.standard_normal((4, 32)).astype(np.float32)
    Xd = rng.standard_normal((9000, 32)).astype(np.float32)
    with pytest.raises(ValueError):        # stage needs keep
        run(Q, Xd, k=8, r=16, bq=4, tile=1024, pack=True, stage=8)
    with pytest.raises(ValueError):        # r+keep*stage not pow2
        run(Q, Xd, k=8, r=14, bq=4, tile=1024, pack=True, keep=2,
            stage=8)
    with pytest.raises(ValueError):        # keep*stage not pow2
        run(Q, Xd, k=8, r=26, bq=4, tile=1024, pack=True, keep=2,
            stage=3)


def test_prered_validation(rng):
    Q = rng.standard_normal((4, 32)).astype(np.float32)
    Xd = rng.standard_normal((1000, 32)).astype(np.float32)
    with pytest.raises(ValueError):        # needs pack
        run(Q, Xd, k=8, r=28, bq=4, tile=1024, keep=4)
    with pytest.raises(ValueError):        # r+keep not power of two
        run(Q, Xd, k=8, r=20, bq=4, tile=1024, pack=True, keep=4)
    with pytest.raises(ValueError):        # keep not a power of two
        run(Q, Xd, k=8, r=29, bq=4, tile=1024, pack=True, keep=3)


def test_pack32_key_roundtrip(rng):
    """Host-side sortable-key transform is an order isomorphism."""
    import jax.numpy as jnp
    from rayuela_tpu.search.scan_pallas import (_sortable_key,
                                                _unsortable_key)
    x = np.concatenate([rng.standard_normal(100) * 100,
                        [0.0, -0.0, 1e-30, -1e-30, 3e38, -3e38]])
    x = x.astype(np.float32)
    k = np.asarray(_sortable_key(jnp.asarray(x)))
    # unsigned key order refines the float order (-0.0 < +0.0 is the
    # only refinement); sorting by key must sort the floats
    xs = x[np.argsort(k)]
    assert (np.diff(xs) >= 0).all()
    np.testing.assert_array_equal(
        np.asarray(_unsortable_key(jnp.asarray(k))), x)


def test_packed_candidates_merge_tree_matches_topk(rng):
    """The bitonic lane-merge tree in `_packed_candidates` == a
    reference global top-k over the flattened (r*128) candidate keys,
    for every (r, k) shape class: r above/below/equal the truncated
    list length, non-power-of-two r and k, k=1, and k = r*128.

    Inputs replicate the kernel's buffer invariants: per-(lane, query)
    keys ascending along the slot axis, unique within a query (the
    packed rowid low bits guarantee uniqueness on-chip), with some
    all-int32-max lanes (a buffer slot never filled)."""
    from rayuela_tpu.search.scan_pallas import LANES, \
        _packed_candidates, _unsortable_key
    imax = np.iinfo(np.int32).max
    for r, k, idbits in [(1, 1, 4), (2, 100, 7), (14, 100, 13),
                         (28, 1000, 13), (28, 1, 13), (6, 500, 10),
                         (28, 28 * 128, 13), (5, 17, 9), (16, 2048, 13),
                         (3, 384, 8)]:
        nq = 9
        # unique keys per query column: sample w/o replacement from a
        # wide range, reshape to (r, LANES), sort ascending per lane
        keys = np.empty((r, LANES, nq), np.int32)
        for q in range(nq):
            vals = rng.choice(1 << 22, size=r * LANES, replace=False)
            vals = (vals.astype(np.int64) << 9) - (1 << 30)
            keys[:, :, q] = np.sort(
                vals.astype(np.int32).reshape(r, LANES), axis=0)
        # empty buffer tails: top slots of a few lanes left at init max
        keys[r // 2:, 3, 0] = imax
        keys[r // 2:, 77, 4] = imax
        vals, ids, tau = jax.jit(
            _packed_candidates, static_argnums=(1, 2, 3, 4))(
                jnp.asarray(keys), nq, r, k, idbits)
        flat = keys.reshape(r * LANES, nq).T              # (nq, rL)
        order = np.argsort(flat, axis=1, kind="stable")
        ref_keys = np.take_along_axis(flat, order, axis=1)[:, :k]
        lane = np.broadcast_to(np.arange(LANES)[None, :],
                               (r, LANES)).reshape(-1)
        ref_ids = ((ref_keys & ((1 << idbits) - 1)) * LANES
                   + lane[order[:, :k]])
        np.testing.assert_array_equal(np.asarray(tau), ref_keys[:, -1])
        ref_vals = np.asarray(_unsortable_key(
            jnp.asarray(ref_keys & np.int32(-1 << idbits))))
        np.testing.assert_array_equal(np.asarray(vals), ref_vals)
        # ids exact wherever keys are unique (everywhere except the
        # injected init-max padding, which ties across lanes)
        uniq = ref_keys != imax
        np.testing.assert_array_equal(np.asarray(ids)[uniq],
                                      ref_ids[uniq])


def test_tail_kernel_matches_xla_candidates(rng):
    """Interpret-mode `_tail_candidates_pallas` (the in-VMEM merge-tree
    kernel) == the XLA `_packed_candidates` reference, over the (r, k)
    config space, on kernel-invariant inputs (per-lane ascending,
    unique keys, some never-filled buffer tails)."""
    from rayuela_tpu.search.scan_pallas import (
        LANES, _packed_candidates, _tail_candidates_pallas)
    imax = np.iinfo(np.int32).max
    for r, k, idbits in [(1, 1, 4), (2, 100, 7), (14, 100, 13),
                         (28, 1000, 13), (28, 1, 13), (6, 500, 10),
                         (5, 17, 9), (3, 384, 8), (16, 2048, 13)]:
        nq, nqp = 9, 128
        keys = np.empty((r, LANES, nqp), np.int32)
        for q in range(nqp):
            vals = rng.choice(1 << 22, size=r * LANES, replace=False)
            vals = (vals.astype(np.int64) << 9) - (1 << 30)
            keys[:, :, q] = np.sort(
                vals.astype(np.int32).reshape(r, LANES), axis=0)
        keys[r // 2:, 3, 0] = imax
        keys[r // 2:, 77, 4] = imax
        keys = np.sort(keys, axis=0)
        ref = _packed_candidates(jnp.asarray(keys), nq, r, k, idbits)
        got = _tail_candidates_pallas(jnp.asarray(keys), nq, r, k,
                                      idbits, interpret=True)
        for g, rf, name in zip(got, ref, ("vals", "ids", "tau")):
            g, rf = np.asarray(g), np.asarray(rf)
            if name == "ids":
                # ids only defined where keys unique (imax padding ties)
                uniq = np.asarray(ref[0]) < np.float32(np.inf)
                fin = np.isfinite(np.asarray(ref[0]))
                np.testing.assert_array_equal(g[fin], rf[fin],
                                              err_msg=f"{r},{k} ids")
            else:
                np.testing.assert_array_equal(g, rf,
                                              err_msg=f"{r},{k} {name}")


def test_tail_kernel_cross_lane_ties_keep_both_ids(rng):
    """Two candidates in different lanes can share an identical packed
    key (same truncated score AND same per-lane row id). The tail
    kernel's roll stages resolve exchanges per-element, so ties must
    break by position — a regression here returns one gid twice and
    silently drops the other."""
    from rayuela_tpu.search.scan_pallas import (
        LANES, _tail_candidates_pallas)
    r, k, idbits = 6, 64, 8
    nq, nqp = 4, 128
    keys = np.empty((r, LANES, nqp), np.int32)
    for q in range(nqp):
        vals = rng.choice(1 << 20, size=r * LANES, replace=False)
        vals = (vals.astype(np.int64) << 9) - (1 << 28)
        keys[:, :, q] = np.sort(
            vals.astype(np.int32).reshape(r, LANES), axis=0)
    # give every key its slot index as the row id (value top bits are
    # distinct above bit 9 > idbits, so per-lane order is preserved
    # and every (rowid, lane) gid is globally unique)
    slot = np.arange(r, dtype=np.int32)[:, None, None]
    keys = (keys & np.int32(-1 << idbits)) | slot
    # plant identical SMALLEST keys (slot 0, rowid 0) in several lanes:
    # equal packed keys, inside the top-k, with distinct gids = lane
    tie_key = np.int32(-(1 << 29) & (-1 << idbits))
    tie_lanes = [5, 77, 12, 100, 31, 64]
    for ln in tie_lanes:
        keys[0, ln, :] = tie_key
    _, ids, _ = _tail_candidates_pallas(jnp.asarray(keys), nq, r, k,
                                        idbits, interpret=True)
    ids = np.asarray(ids)
    want = set(tie_lanes)                    # gid = 0*128 + lane
    for q in range(nq):
        got = ids[q].tolist()
        assert len(set(got)) == k, f"q{q}: duplicate ids"
        assert want <= set(got), f"q{q}: tied ids lost"


def test_pack32_tail_kernel_end_to_end(rng):
    """Full packed scan with the Pallas tail kernel == the identical
    scan with the XLA tail, bit-for-bit (dists, ids, flags), across
    more than one tail-kernel query block (nqp=256)."""
    nq, n, d, k = 130, 1500, 16, 100
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    a = run(Q, Xd, k=k, r=14, bq=128, tile=1024, pack=True, keep=2,
            tail=True)
    b = run(Q, Xd, k=k, r=14, bq=128, tile=1024, pack=True, keep=2,
            tail=False)
    for x, y, name in zip(a, b, ("dists", "ids", "flagged")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_auto_config_valid_across_k_classes():
    """Every auto configuration must satisfy the kernel's static
    constraints (so the TPU path never falls back for a config bug)."""
    from rayuela_tpu.search.scan_pallas import LANES, _auto_config
    for k in (1, 10, 100, 512, 513, 1000, 3000, 28 * 128, 28 * 128 + 1,
              56 * 128):
        for nq in (1, 7, 128, 2000, 10_000):
            for pack in (False, True):
                for f32, n in ((False, None), (True, None),
                               (False, 20_000), (False, 1_000_000),
                               (False, 100_000_000)):
                    r, bq, tile, keep, stage, premin = _auto_config(
                        k, nq, pack, f32, n=n)
                    rows = tile // LANES
                    assert rows & (rows - 1) == 0
                    assert bq >= 1
                    kmax = (96 if pack else 48) * LANES
                    assert k <= r * LANES or k > kmax
                    reff = rows >> premin
                    assert premin == 0 or pack
                    if pack and keep:
                        assert keep & (keep - 1) == 0 and keep <= reff
                        w = r + keep * max(1, stage)
                        assert w & (w - 1) == 0
                        if stage:
                            ks = keep * stage
                            assert ks & (ks - 1) == 0 and keep < reff
                    else:
                        assert stage == 0 and premin == 0
                        assert (r + rows) & (r + rows - 1) == 0


def test_premin_inline_rescue_slot_overflow(rng, monkeypatch):
    """More flagged queries than in-graph rescue slots: the un-slotted
    flags must survive to the host and fall through to the XLA rescan —
    the combined result stays exact."""
    from rayuela_tpu.search import scan_pallas as sp
    nq, n, d, k = 8, 20_000, 32, 10
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 30.0
    for q in range(6):                  # 6 queries lose a hit
        Xd[q * 512 + 7] = Q[q] + 1e-3
        Xd[q * 512 + 135] = Q[q] - 1e-3
    Xj, x2 = jnp.asarray(Xd), jnp.sum(jnp.asarray(Xd) ** 2, -1)
    idx = sp.LinscanIndex(Xj, x2)
    kw = dict(r=14, bq=8, tile=1024, pack=True, keep=2)
    d0, i0 = sp.search(idx, Q, k, interpret=True, premin=0, **kw)
    monkeypatch.setattr(sp, "_PREMIN_NR", 2)   # force slot overflow
    d1, i1 = sp.search(idx, Q, k, interpret=True, premin=1, **kw)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))


def test_premin_inline_rescue_non_lane_aligned_nq(rng):
    """nq=200 (not a multiple of 128) through the premin inline path:
    the rescue's query-block width must round UP to a lane multiple
    (Mosaic rejects bq=200 output DMA slices — found via the HPO run)
    and results must stay exact."""
    from rayuela_tpu.search import scan_pallas as sp
    nq, n, d, k = 200, 20_000, 32, 10
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32) + 30.0
    for q in range(4):
        Xd[q * 512 + 7] = Q[q] + 1e-3
        Xd[q * 512 + 135] = Q[q] - 1e-3
    Xj, x2 = jnp.asarray(Xd), jnp.sum(jnp.asarray(Xd) ** 2, -1)
    idx = sp.LinscanIndex(Xj, x2)
    kw = dict(r=14, bq=8, tile=1024, pack=True, keep=2)
    d0, i0 = sp.search(idx, Q, k, interpret=True, premin=0, **kw)
    d1, i1 = sp.search(idx, Q, k, interpret=True, premin=1, **kw)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))


def test_decoded_search_k_exceeding_n_clamps(rng):
    """Decoded-path front-end: k > n clamps to n; k beyond the deepest
    kernel buffer falls back to the exact XLA rescan (verify probe)."""
    from rayuela_tpu.search.scan_pallas import build_index, search
    d, m, h, n = 16, 4, 16, 400
    C = jnp.asarray(rng.standard_normal((m, h, d // m)).astype(np.float32))
    B = jnp.asarray(rng.integers(0, h, size=(n, m)), jnp.int32)
    Q = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))
    idx = build_index(C, B, pq=True, d=d)
    dv, di = search(idx, Q, n + 99, interpret=True)
    assert dv.shape == (3, n) and di.shape == (3, n)
    assert np.isfinite(np.asarray(dv)).all()
    assert (np.asarray(di) >= 0).all() and (np.asarray(di) < n).all()


def test_score16_matches_brute_force(rng):
    """score16 mode (bf16 score block + 16-bit key value field,
    `_row_key16`): the result must be the exact top-k of the
    BF16-ROUNDED scores on every packed kernel variant — true
    distances of returned ids within bf16 resolution of the brute
    curve, reported dists equal to the bf16 rounding of the true
    scores, certificate flags still honest."""
    nq, n, d, k = 16, 3 * 2048 + 17, 32, 48
    Q = rng.standard_normal((nq, d)).astype(np.float32)
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    ref_d, _ = brute(Q, Xd, k)
    for kw in (dict(r=16, bq=128, tile=2048, keep=2, stage=8),
               dict(r=14, bq=128, tile=2048, keep=2),
               dict(r=48, bq=128, tile=2048)):
        dists, ids, flagged = run(Q, Xd, k=k, pack=True, score16=True,
                                  **kw)
        ids = np.asarray(ids)
        assert (ids >= 0).all() and (ids < n).all()
        for q in range(nq):            # packed keys stay unique
            assert len(set(ids[q])) == k
        ok = ~np.asarray(flagged)
        D = ((Q[:, None, :].astype(np.float64) - Xd[None]) ** 2).sum(-1)
        picked = np.take_along_axis(D, ids, axis=1)
        # bf16 has ~2^-8 relative resolution; boundary swaps move the
        # curve by at most that
        np.testing.assert_allclose(picked[ok], ref_d[ok], rtol=2e-2,
                                   atol=2e-2)
        # reported dists are the bf16 roundings the kernel selected on
        # (+ the f32 |q|^2 added outside the kernel)
        kern = (-2.0 * Q @ Xd.T + (Xd ** 2).sum(1)[None, :]).astype(
            np.float32)
        kern16 = np.take_along_axis(
            jnp.asarray(kern).astype(jnp.bfloat16).astype(
                jnp.float32).__array__(), ids, axis=1)
        expected = kern16 + (Q ** 2).sum(1, keepdims=True)
        # scores sitting exactly on a bf16 rounding boundary can round
        # differently in the kernel's f32 accumulation order than in
        # numpy's — allow a 1-ulp (2^-8 rel) disagreement on a tiny
        # fraction, exact equality on the rest
        close = np.isclose(np.asarray(dists), expected, rtol=1e-6,
                           atol=1e-5)
        assert close.mean() > 0.99, close.mean()
        np.testing.assert_allclose(np.asarray(dists), expected,
                                   rtol=2 ** -8, atol=1e-4)

    # premin in-graph rescue composes with score16
    from rayuela_tpu.search.scan_pallas import _scan_premin_inline
    d2, i2, f2 = _scan_premin_inline(
        jnp.asarray(Q), jnp.asarray(Xd),
        jnp.sum(jnp.asarray(Xd) ** 2, -1), k=k, r=16, bq=128,
        tile=2048, keep=2, stage=8, premin=2, nr=16, interpret=True,
        score16=True)
    ok = ~np.asarray(f2)
    D = ((Q[:, None, :].astype(np.float64) - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(i2), axis=1)
    np.testing.assert_allclose(np.sort(picked, 1)[ok], ref_d[ok],
                               rtol=2e-2, atol=2e-2)


def test_score16_validation(rng):
    from rayuela_tpu.search.scan_pallas import pallas_scan_topk
    Q = rng.standard_normal((4, 8)).astype(np.float32)
    Xd = rng.standard_normal((256, 8)).astype(np.float32)
    x2 = jnp.sum(jnp.asarray(Xd) ** 2, -1)
    with pytest.raises(ValueError, match="score16 requires pack"):
        pallas_scan_topk(jnp.asarray(Q), jnp.asarray(Xd), x2, k=4,
                         r=14, bq=4, tile=256, pack=False,
                         score16=True, interpret=True)
    with pytest.raises(ValueError, match="exclusive"):
        pallas_scan_topk(jnp.asarray(Q), jnp.asarray(Xd), x2, k=4,
                         r=14, bq=4, tile=256, pack=True, qbias=True,
                         score16=True, interpret=True)


def test_decoded_search_segments_beyond_id_range(rng, monkeypatch):
    """Decoded bases past the pack32 row-id range segment on device
    with an exact merge (round 4: the unsegmented kernel compile
    failed opaquely at n=9.1e6, a size that fits HBM decoded) — force
    tiny segments and compare against the unsegmented packed path."""
    from rayuela_tpu.search import scan_pallas as sp
    n, d, nq, k = 5000, 32, 9, 20
    Xd = rng.standard_normal((n, d)).astype(np.float32)
    Xj, x2 = jnp.asarray(Xd), jnp.sum(jnp.asarray(Xd) ** 2, -1)
    idx = sp.LinscanIndex(Xj, x2)
    kw = dict(interpret=True, pack=True, r=14, bq=8, tile=1024, keep=2)
    Q = jnp.asarray(rng.standard_normal((nq, d)).astype(np.float32))
    d1, i1 = sp.search(idx, Q, k, **kw)
    monkeypatch.setattr(sp, "_SEG_DECODED", 2048)
    d2, i2 = sp.search(idx, Q, k, **kw)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-4, atol=1e-3)
    D = ((np.asarray(Q)[:, None, :] - Xd[None]) ** 2).sum(-1)
    picked = np.take_along_axis(D, np.asarray(i2), axis=1)
    np.testing.assert_allclose(picked, np.asarray(d2), rtol=1e-4,
                               atol=1e-3)
