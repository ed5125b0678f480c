"""High-level facade: train → index_base → search for every method."""

import numpy as np
import pytest

from rayuela_tpu import api


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((10, 16)).astype(np.float32)

    def draw(n):
        a = rng.integers(0, 10, n)
        return (centers[a]
                + 0.2 * rng.standard_normal((n, 16))).astype(np.float32)

    Xt, Xb = draw(800), draw(3000)
    Q = Xb[:40] + 0.02 * rng.standard_normal((40, 16)).astype(np.float32)
    return Xt, Xb, Q


@pytest.mark.parametrize("method", ["pq", "opq", "rvq", "chainq",
                                    "sr_d", "compq"])
def test_facade_end_to_end(data, method):
    Xt, Xb, Q = data
    kw = {}
    if method == "sr_d":
        kw = dict(ilsiter=2, icmiter=2, npert=1, chunk=512)
    model = api.train(Xt, method=method, m=4, h=16, niter=3, **kw)
    enc_kw = dict(ilsiter=2, icmiter=2, npert=1, chunk=512) \
        if method == "sr_d" else {}
    index = api.index_base(model, Xb, **enc_kw)
    dists, ids = api.search(index, Q, k=20)
    ids = np.asarray(ids)
    assert ids.shape == (40, 20)
    hits = (ids == np.arange(40)[:, None]).any(axis=1).mean()
    assert hits > 0.8, f"{method}: recall@20 {hits}"


def test_facade_rejects_unknown_method(data):
    Xt, _, _ = data
    with pytest.raises(ValueError):
        api.train(Xt, method="nope")


def test_save_load_roundtrip(rng, tmp_path):
    """Model and index persistence: a reloaded index must search
    identically to the live one (no re-encode), in both layouts and
    across a layout override on load."""
    import rayuela_tpu.api as rq
    Xt = rng.standard_normal((600, 32)).astype(np.float32)
    Xb = rng.standard_normal((800, 32)).astype(np.float32)
    Q = Xb[:15] + 0.01 * rng.standard_normal((15, 32)).astype(np.float32)

    for method in ("pq", "rvq"):          # pq layout + norms-byte path
        model = rq.train(Xt, method=method, m=4, h=16, niter=4)
        mp = tmp_path / f"{method}.model.h5"
        rq.save_model(str(mp), model)
        m2 = rq.load_model(str(mp))
        assert m2.method == model.method and m2.h == model.h
        np.testing.assert_array_equal(np.asarray(m2.codebooks),
                                      np.asarray(model.codebooks))

        for mode in ("decoded", "codes"):
            idx = rq.index_base(model, Xb, mode=mode)
            ip = tmp_path / f"{method}.{mode}.index.h5"
            rq.save_index(str(ip), idx)
            idx2 = rq.load_index(str(ip))
            assert idx2.mode == mode
            np.testing.assert_array_equal(np.asarray(idx2.codes),
                                          np.asarray(idx.codes))
            d1, i1 = rq.search(idx, Q, k=10)
            d2, i2 = rq.search(idx2, Q, k=10)
            np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

        # layout override: decoded-saved index reloaded code-resident
        idx3 = rq.load_index(str(tmp_path / f"{method}.decoded.index.h5"),
                             mode="codes")
        assert idx3.mode == "codes"
        d3, i3 = rq.search(idx3, Q, k=10)
        assert (np.asarray(i3) < 800).all()


def test_api_search_streamed_matches_resident(rng):
    """`api.search_streamed` (beyond-HBM facade rung): host-resident
    packed codes streamed in shards == the resident codes index, for
    PQ and for an additive model with the norms byte."""
    import rayuela_tpu.api as rq
    Xt = rng.standard_normal((600, 32)).astype(np.float32)
    Xb = rng.standard_normal((800, 32)).astype(np.float32)
    Q = Xb[:10] + 0.01 * rng.standard_normal((10, 32)).astype(np.float32)

    for method in ("pq", "rvq"):
        model = rq.train(Xt, method=method, m=4, h=16, niter=4)
        idx = rq.index_base(model, Xb, mode="codes")
        d1, i1 = rq.search(idx, Q, k=15)
        d2, i2 = rq.search_streamed(
            model, np.asarray(idx.scan_index.packed), Q, k=15,
            norms_cbook=idx.norms_codebook,
            mprime=idx.scan_index.mprime, shard_n=300)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=1e-4, atol=1e-3)


def test_codes_mode_index_and_search(rng):
    """mode='codes' end-to-end through the facade: PQ layout and an
    additive method with quantized-norms byte."""
    import rayuela_tpu.api as rq
    Xt = rng.standard_normal((600, 32)).astype(np.float32)
    Xb = rng.standard_normal((800, 32)).astype(np.float32)
    Q = Xb[:20] + 0.01 * rng.standard_normal((20, 32)).astype(np.float32)

    for method in ("pq", "rvq"):
        model = rq.train(Xt, method=method, m=4, h=16, niter=4)
        idx = rq.index_base(model, Xb, mode="codes")
        assert idx.mode == "codes"
        d, i = rq.search(idx, Q, k=20)
        i = np.asarray(i)
        assert i.shape == (20, 20) and (i < 800).all() and (i >= 0).all()
        hit = (i == np.arange(20)[:, None]).any(1).mean()
        assert hit > 0.5, (method, hit)
