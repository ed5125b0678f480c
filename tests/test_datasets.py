"""Dataset catalog tests: HDF5 ingestion against real fixture files in
the layouts found in the wild (reference's own Julia-written files,
`src/read_datasets.jl:187-224`; ann-benchmarks exports), plus catalog
naming."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from rayuela_tpu.experiments.datasets import (_TEXMEX, _load_hdf5,
                                              read_dataset)


def _mk(tmp_path, arrays):
    path = str(tmp_path / "fixture.h5")
    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f[k] = v
    return path


def test_hdf5_row_major_standard_keys(tmp_path, rng):
    Xt = rng.standard_normal((50, 8)).astype(np.float32)
    Xb = rng.standard_normal((70, 8)).astype(np.float32)
    Xq = rng.standard_normal((9, 8)).astype(np.float32)
    gt = rng.integers(0, 70, 9)
    p = _mk(tmp_path, {"train": Xt, "base": Xb, "query": Xq,
                       "groundtruth": gt})
    ds = _load_hdf5("fix", 50, 70, 9, path=p)
    np.testing.assert_array_equal(ds.Xb, Xb)
    np.testing.assert_array_equal(ds.gt, gt.astype(np.int32))


def test_hdf5_julia_layout_base_is_train_one_based_gt(tmp_path, rng):
    """The reference's MNIST/LabelMe shape: keys train/test/gt, feature
    axis first ((d, n) on disk), no base key (base == train), 1-based
    ids (`read_datasets.jl:187-224`)."""
    d, nt, nq = 8, 60, 7
    Xt = rng.standard_normal((d, nt)).astype(np.float32)
    Xq = rng.standard_normal((d, nq)).astype(np.float32)
    gt = np.concatenate([[nt], rng.integers(1, nt + 1, nq - 1)])  # 1-based
    p = _mk(tmp_path, {"train": Xt, "test": Xq, "gt": gt})
    ds = _load_hdf5("fix", nt, nt, nq, path=p)
    assert ds.Xt.shape == (nt, d) and ds.Xq.shape == (nq, d)
    np.testing.assert_array_equal(ds.Xb, ds.Xt)          # base == train
    np.testing.assert_array_equal(ds.gt, gt - 1)         # re-based
    assert ds.gt.max() == nt - 1


def test_hdf5_ann_benchmarks_layout(tmp_path, rng):
    """train/test/neighbors keys, (nq, knn) neighbor matrix, 0-based."""
    Xt = rng.standard_normal((40, 6)).astype(np.float32)
    Xq = rng.standard_normal((5, 6)).astype(np.float32)
    nb = rng.integers(0, 40, (5, 10))
    p = _mk(tmp_path, {"train": Xt, "test": Xq, "neighbors": nb})
    ds = _load_hdf5("fix", 40, 40, 5, path=p)
    np.testing.assert_array_equal(ds.gt, nb[:, 0].astype(np.int32))


def test_hdf5_missing_key_raises(tmp_path, rng):
    p = _mk(tmp_path, {"train": rng.standard_normal((4, 3))})
    with pytest.raises(KeyError, match="query"):
        _load_hdf5("fix", 4, 4, 2, path=p)


def test_hdf5_out_of_range_gt_raises(tmp_path, rng):
    Xt = rng.standard_normal((10, 4)).astype(np.float32)
    p = _mk(tmp_path, {"train": Xt, "base": Xt, "query": Xt[:2],
                       "gt": np.array([3, 25])})
    with pytest.raises(ValueError, match="out of range"):
        _load_hdf5("fix", 10, 10, 2, path=p)


def test_catalog_has_reference_names():
    """Every named dataset in `src/read_datasets.jl` has a catalog
    entry (SIFT10M/100M slice the SIFT1B files with their own gt,
    `:154-185`; Deep1M_babenko `:10-33`)."""
    for name in ("sift1m", "gist1m", "sift1b", "sift10m", "sift100m",
                 "deep1b", "deep1m-babenko"):
        assert name in _TEXMEX, name
    assert _TEXMEX["sift10m"]["gt"].endswith("idx_10M.ivecs")
    assert _TEXMEX["sift100m"]["gt"].endswith("idx_100M.ivecs")
    assert _TEXMEX["sift10m"]["nbase"] == 10_000_000
    assert _TEXMEX["sift100m"]["nbase"] == 100_000_000


def test_synthetic_unaffected_by_none_nbase():
    ds = read_dataset("synthetic", ntrain=100, nbase=500, nquery=10,
                      d=16)
    assert ds.Xb.shape == (500, 16)


def test_synthetic_corr_is_correlated_and_opq_friendly():
    """`synthetic-corr`: anisotropic latent spectrum + random rotation.
    The output covariance must have strongly decaying eigenvalues but
    NOT be axis-aligned (dims correlated), and OPQ's learned rotation
    must beat plain PQ on it — the regime where the LSQ++ paper's
    method ordering holds (isotropic `synthetic` is rotation-invariant
    so OPQ could only tie PQ there)."""
    import jax
    import jax.numpy as jnp

    from rayuela_tpu.models.opq import train_opq
    from rayuela_tpu.models.pq import train_pq

    ds = read_dataset("synthetic-corr-small", nquery=50, ncenters=8)
    assert ds.Xt.shape[1] == 32 and ds.gt.max() < ds.Xb.shape[0]
    cov = np.cov(ds.Xt.T)
    ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert ev[0] / ev[-1] > 30          # anisotropic spectrum
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() > 0.1 * np.diag(cov).max()  # correlated

    X = jnp.asarray(ds.Xt)
    _, _, pq_err = train_pq(jax.random.PRNGKey(0), X, m=4, h=16,
                            iters=15)
    _, _, obj = train_opq(jax.random.PRNGKey(0), X, m=4, h=16,
                          niter=15, init="random")
    assert float(obj[-1]) < 0.97 * float(np.ravel(pq_err)[-1])


def test_exact_ground_truth_matches_f64_brute_force():
    """Two-pass device GT (f32 candidates + f64 refine) == pure f64
    host argmin, including near-duplicate base rows that stress f32
    resolution."""
    from rayuela_tpu.experiments.datasets import exact_ground_truth

    rng = np.random.default_rng(3)
    n, d, nq = 5000, 24, 300
    Xb = rng.standard_normal((n, d)).astype(np.float32)
    # near-duplicates of some rows at ~f32-resolution separation
    Xb[1000:1200] = Xb[:200] + 1e-6
    Xq = np.concatenate([
        rng.standard_normal((nq - 100, d)).astype(np.float32),
        Xb[:100] + 1e-3 * rng.standard_normal((100, d)).astype(
            np.float32)])
    gt = exact_ground_truth(Xq, Xb, ncand=8)
    b = Xb.astype(np.float64)
    ref = np.array([np.argmin(((b - q) ** 2).sum(1))
                    for q in Xq.astype(np.float64)])
    same = gt == ref
    if not same.all():
        # ties at f64: accept any id with identical f64 distance
        for i in np.nonzero(~same)[0]:
            q = Xq[i].astype(np.float64)
            d_gt = ((b[gt[i]] - q) ** 2).sum()
            d_ref = ((b[ref[i]] - q) ** 2).sum()
            assert d_gt == d_ref, (i, d_gt, d_ref)


def test_synthetic_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("RAYUELA_SYNTH_CACHE", str(tmp_path))
    a = read_dataset("synthetic", ntrain=50, nbase=400, nquery=8, d=8)
    assert len(list(tmp_path.iterdir())) == 1
    b = read_dataset("synthetic", ntrain=50, nbase=400, nquery=8, d=8)
    np.testing.assert_array_equal(a.Xb, b.Xb)
    np.testing.assert_array_equal(a.gt, b.gt)
    c = read_dataset("synthetic", ntrain=50, nbase=400, nquery=8, d=8,
                     seed=1)
    assert len(list(tmp_path.iterdir())) == 2
    assert not np.array_equal(a.Xb, c.Xb)


# ---------------------------------------------------------------------------
# TEXMEX path: fixture files written by the repo's own writers, read
# back through read_dataset and driven end-to-end (reference semantics:
# `src/read_datasets.jl:126-153` — learn/base/query xvecs + a (knn, nq)
# groundtruth ivecs whose FIRST entry per query is the true NN).
# ---------------------------------------------------------------------------

def _write_texmex_fixture(root, rng, fmt="fvecs", d=16, ntrain=300,
                          nbase=800, nquery=40, knn=10):
    import os

    from rayuela_tpu.io.xvecs import (bvecs_write, fvecs_write,
                                      ivecs_write)
    sub = {"fvecs": "sift", "bvecs": "sift1b"}[fmt]
    os.makedirs(os.path.join(root, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "sift1b", "gnd"), exist_ok=True)
    if fmt == "fvecs":
        draw = lambda n: rng.standard_normal((n, d)).astype(np.float32)
        write = fvecs_write
        names = dict(train="sift/sift_learn.fvecs",
                     base="sift/sift_base.fvecs",
                     query="sift/sift_query.fvecs",
                     gt="sift/sift_groundtruth.ivecs")
    else:
        draw = lambda n: rng.integers(0, 256, (n, d)).astype(np.uint8)
        write = bvecs_write
        names = dict(train="sift1b/bigann_learn.bvecs",
                     base="sift1b/bigann_base.bvecs",
                     query="sift1b/bigann_query.bvecs",
                     gt="sift1b/gnd/idx_10M.ivecs")
    Xt, Xb = draw(ntrain), draw(nbase)
    Xq = Xb[rng.integers(0, nbase, nquery)].astype(np.float32)
    Xq = Xq + 0.05 * rng.standard_normal((nquery, d)).astype(np.float32)
    if fmt == "bvecs":
        Xq = np.clip(np.round(Xq), 0, 255).astype(np.uint8)
    d2 = ((Xq.astype(np.float64)[:, None]
           - Xb.astype(np.float64)[None]) ** 2).sum(-1)
    gt_full = np.argsort(d2, axis=1)[:, :knn].astype(np.int32)
    write(os.path.join(root, names["train"]), Xt)
    write(os.path.join(root, names["base"]), Xb)
    write(os.path.join(root, names["query"]), Xq)
    ivecs_write(os.path.join(root, names["gt"]), gt_full)
    return Xt, Xb, Xq, gt_full


def test_texmex_fvecs_read_dataset_roundtrip(tmp_path, monkeypatch):
    rng = np.random.default_rng(7)
    Xt, Xb, Xq, gt_full = _write_texmex_fixture(str(tmp_path), rng)
    monkeypatch.setenv("RAYUELA_DATA", str(tmp_path))
    ds = read_dataset("sift1m", ntrain=300, nbase=800, nquery=40)
    np.testing.assert_array_equal(ds.Xt, Xt)
    np.testing.assert_array_equal(ds.Xb, Xb)
    np.testing.assert_array_equal(ds.Xq, Xq)
    np.testing.assert_array_equal(ds.gt, gt_full[:, 0])
    assert ds.Xt.dtype == np.float32 and ds.gt.dtype == np.int32
    # partial reads (smaller nquery) slice the files, not error
    ds2 = read_dataset("sift1m", ntrain=100, nbase=500, nquery=10)
    np.testing.assert_array_equal(ds2.Xb, Xb[:500])
    np.testing.assert_array_equal(ds2.gt, gt_full[:10, 0])


def test_texmex_bvecs_sift1b_family(tmp_path, monkeypatch):
    """bvecs ingestion (SIFT1B family): uint8 → f32 conversion and the
    sliced-base semantics (sift10m = first N of the 1B base with its
    own gt file, reference `src/read_datasets.jl:154-185`)."""
    rng = np.random.default_rng(8)
    Xt, Xb, Xq, gt_full = _write_texmex_fixture(str(tmp_path), rng,
                                                fmt="bvecs")
    monkeypatch.setenv("RAYUELA_DATA", str(tmp_path))
    ds = read_dataset("sift10m", ntrain=300, nbase=800, nquery=40)
    assert ds.Xb.dtype == np.float32
    np.testing.assert_array_equal(ds.Xb, Xb.astype(np.float32))
    np.testing.assert_array_equal(ds.gt, gt_full[:, 0])


def test_texmex_end_to_end_protocol(tmp_path, monkeypatch):
    """read_dataset("sift1m") → run_train_query_base at toy sizes: the
    exact command a machine with the real TEXMEX files runs for the
    parity tables (docs/real_data.md), on fixture files here."""
    from rayuela_tpu.experiments.drivers import run_train_query_base

    rng = np.random.default_rng(9)
    _write_texmex_fixture(str(tmp_path), rng, d=16, nbase=800)
    monkeypatch.setenv("RAYUELA_DATA", str(tmp_path))
    ds = read_dataset("sift1m", ntrain=300, nbase=800, nquery=40)
    res = run_train_query_base(ds, m=4, h=16, niter=2, ntrials=1,
                               knn=50, methods=("pq", "opq"),
                               results_dir=str(tmp_path / "res"),
                               verbose=False)
    for outs in res.values():
        r = outs[0]["recall"]
        assert r[-1] > 0.5 and (np.diff(r) >= 0).all()
