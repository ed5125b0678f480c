"""Dataset catalog — name → (train / base / query / ground-truth).

Capability parity with reference `src/read_datasets.jl:4-244`
(``read_dataset``): SIFT1M, SIFT1B/10M subsets, GIST1M, Deep1M/Deep1B,
Convnet1M, MNIST, LabelMe22K, each loaded from TEXMEX fvecs/bvecs or
HDF5 files under a data root (env ``RAYUELA_DATA``, default
``~/Research/datasets`` like the reference's hardcoded paths).

Additions over the reference: a ``synthetic`` family (clustered
Gaussian data with exact brute-force ground truth) so every experiment
driver runs end-to-end on machines without the benchmark files, and
explicit ground-truth conventions: returned gt is ALWAYS 0-based (the
reference adds 1 to SIFT/GIST gt at `demos/experiment_utils.jl:74-76`;
we stay 0-based everywhere).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from rayuela_tpu.io.xvecs import bvecs_read, fvecs_read, ivecs_read


def data_root() -> str:
    return os.environ.get(
        "RAYUELA_DATA", os.path.expanduser("~/Research/datasets"))


class Dataset(NamedTuple):
    name: str
    Xt: np.ndarray       # (ntrain, d) f32 — training vectors
    Xb: np.ndarray       # (nbase, d)  f32 — base set
    Xq: np.ndarray       # (nquery, d) f32 — queries
    gt: np.ndarray       # (nquery,) int32 — 0-based true-NN ids into Xb


# name → file layout. ``nbase`` caps the base-set size where a slice of
# a bigger file defines the dataset (SIFT10M/100M are the first 10M/100M
# of the SIFT1B base with their own ground-truth files, reference
# `src/read_datasets.jl:154-185`).
_TEXMEX = {
    "sift1m": dict(train="sift/sift_learn.fvecs",
                   base="sift/sift_base.fvecs",
                   query="sift/sift_query.fvecs",
                   gt="sift/sift_groundtruth.ivecs", fmt="fvecs"),
    "gist1m": dict(train="gist/gist_learn.fvecs",
                   base="gist/gist_base.fvecs",
                   query="gist/gist_query.fvecs",
                   gt="gist/gist_groundtruth.ivecs", fmt="fvecs"),
    # `src/read_datasets.jl:10-33`: the Babenko deep1M fvecs release
    "deep1m-babenko": dict(train="deep_babenko/deep1M_learn.fvecs",
                           base="deep_babenko/deep1M_base.fvecs",
                           query="deep_babenko/deep1M_queries.fvecs",
                           gt="deep_babenko/deep1M_groundtruth.ivecs",
                           fmt="fvecs"),
    "sift1b": dict(train="sift1b/bigann_learn.bvecs",
                   base="sift1b/bigann_base.bvecs",
                   query="sift1b/bigann_query.bvecs",
                   gt="sift1b/gnd/idx_1000M.ivecs", fmt="bvecs"),
    "sift10m": dict(train="sift1b/bigann_learn.bvecs",
                    base="sift1b/bigann_base.bvecs",
                    query="sift1b/bigann_query.bvecs",
                    gt="sift1b/gnd/idx_10M.ivecs", fmt="bvecs",
                    nbase=10_000_000),
    "sift100m": dict(train="sift1b/bigann_learn.bvecs",
                     base="sift1b/bigann_base.bvecs",
                     query="sift1b/bigann_query.bvecs",
                     gt="sift1b/gnd/idx_100M.ivecs", fmt="bvecs",
                     nbase=100_000_000),
    "deep1b": dict(train="deep1b/learn.fvecs", base="deep1b/base.fvecs",
                   query="deep1b/query.fvecs",
                   gt="deep1b/groundtruth.ivecs", fmt="fvecs"),
}

# HDF5-packaged sets (reference keeps these as .h5/.mat,
# `src/read_datasets.jl:86-125,187-224`)
_HDF5 = {
    "mnist": "mnist/mnist.h5",
    "labelme22k": "labelme/labelme.h5",
    "convnet1m": "convnet1m/convnet1m.h5",
    "deep1m": "deep/deep1m.h5",
}

# Accepted key spellings per role, tried in order. Covers the
# reference's own files ("train"/"test"/"gt", `read_datasets.jl:
# 187-224`), its Convnet .mat keys, and ann-benchmarks-style files
# ("train"/"test"/"neighbors"). A missing base key falls back to the
# train set (the reference's MNIST/LabelMe are query/base protocols
# where base == train, `read_datasets.jl:195,215`).
_H5_KEYS = {
    "train": ("train", "learn", "Xt", "feats_m_128_train"),
    "base": ("base", "dataset", "Xb", "feats_m_128_base",
             "train", "learn", "feats_m_128_train"),
    "query": ("query", "test", "queries", "Xq", "feats_m_128_test"),
    "gt": ("groundtruth", "gt", "neighbors", "idx"),
}


def _load_texmex(name: str, ntrain: int, nbase: int, nquery: int
                 ) -> Dataset:
    e = _TEXMEX[name]
    root = data_root()
    rd = fvecs_read if e["fmt"] == "fvecs" else bvecs_read
    Xt = rd(os.path.join(root, e["train"]), 0, ntrain).astype(np.float32)
    Xb = rd(os.path.join(root, e["base"]), 0, nbase).astype(np.float32)
    Xq = rd(os.path.join(root, e["query"]), 0, nquery).astype(np.float32)
    gt = ivecs_read(os.path.join(root, e["gt"]), 0, nquery)[:, 0]
    return Dataset(name, Xt, Xb, Xq, gt.astype(np.int32))


def _h5_pick(f, role: str):
    for k in _H5_KEYS[role]:
        if k in f:
            return np.asarray(f[k])
    return None


def _load_hdf5(name: str, ntrain: int, nbase: int, nquery: int,
               path: str | None = None) -> Dataset:
    """Tolerant HDF5 ingestion: accepts the key spellings in
    ``_H5_KEYS``, either (n, d) or Julia-written (d, n) layouts, gt as
    a vector or a (nq, knn) id matrix, and 1-based (Julia) gt ids
    (detected by an id == nbase, out of range for 0-based)."""
    import h5py
    if path is None:
        path = os.path.join(data_root(), _HDF5[name])
    with h5py.File(path, "r") as f:
        Xt, Xb, Xq = (_h5_pick(f, r) for r in ("train", "base", "query"))
        gt = _h5_pick(f, "gt")
    for role, arr in (("train", Xt), ("base", Xb), ("query", Xq),
                      ("gt", gt)):
        if arr is None:
            raise KeyError(
                f"{path}: no {role} key (tried {_H5_KEYS[role]})")

    # Julia's h5write stores a (d, n) matrix so h5py sees (n, d) — but
    # files written row-major as (d, n) appear with the shared feature
    # axis FIRST on every array. Detect and transpose.
    if (Xt.shape[0] == Xb.shape[0] == Xq.shape[0]
            and not (Xt.shape[1] == Xb.shape[1] == Xq.shape[1])):
        Xt, Xb, Xq = Xt.T, Xb.T, Xq.T
    Xt = np.asarray(Xt[:ntrain], np.float32)
    Xb = np.asarray(Xb[:nbase], np.float32)
    Xq = np.asarray(Xq[:nquery], np.float32)

    gt = np.asarray(gt)
    if gt.ndim == 2:
        # (nq, knn) id matrix (or its transpose): keep the true-NN col
        if gt.shape[0] != Xq.shape[0] and gt.shape[1] == Xq.shape[0]:
            gt = gt.T
        gt = gt[:, 0]
    gt = gt[:nquery].astype(np.int64)
    if gt.max(initial=0) >= Xb.shape[0]:    # 1-based (Julia) ids
        gt = gt - 1
    if gt.min(initial=0) < 0 or gt.max(initial=0) >= Xb.shape[0]:
        raise ValueError(f"{path}: ground-truth ids out of range "
                         f"[0, {Xb.shape[0]}) after normalization")
    return Dataset(name, Xt, Xb, Xq, gt.astype(np.int32))


def make_synthetic(d: int = 128, ntrain: int = 10_000,
                   nbase: int = 100_000, nquery: int = 1_000,
                   ncenters: int = 64, noise: float = 0.3,
                   seed: int = 0, name: str = "synthetic",
                   corr: bool = False) -> Dataset:
    cache_dir = os.environ.get("RAYUELA_SYNTH_CACHE")
    if cache_dir:
        tag = (f"{name}_d{d}_t{ntrain}_b{nbase}_q{nquery}_c{ncenters}"
               f"_n{noise}_s{seed}_corr{int(corr)}.npz")
        path = os.path.join(cache_dir, tag)
        if os.path.exists(path):
            z = np.load(path)
            return Dataset(name, z["Xt"], z["Xb"], z["Xq"], z["gt"])
        ds = _make_synthetic(d, ntrain, nbase, nquery, ncenters, noise,
                             seed, name, corr)
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path + ".tmp.npz", Xt=ds.Xt, Xb=ds.Xb, Xq=ds.Xq,
                 gt=ds.gt)
        os.replace(path + ".tmp.npz", path)
        return ds
    return _make_synthetic(d, ntrain, nbase, nquery, ncenters, noise,
                           seed, name, corr)


def _make_synthetic(d: int, ntrain: int, nbase: int, nquery: int,
                    ncenters: int, noise: float, seed: int, name: str,
                    corr: bool) -> Dataset:
    """Clustered Gaussian data with exact brute-force ground truth.

    Queries are perturbed base vectors so recall curves are meaningful
    at small scale.

    ``corr=True`` makes the distribution anisotropic AND correlated:
    clusters and noise are drawn in a latent space with a decaying
    per-dimension spectrum, then mapped through a random orthogonal
    rotation. Real descriptors (SIFT/GIST/deep features) look like
    this, and it is the regime where the LSQ++ paper's method ordering
    holds: contiguous-subspace PQ suffers the cross-subspace
    correlations, OPQ's learned rotation recovers them. The isotropic
    default is rotation-invariant in distribution, so OPQ's R can only
    match PQ there (the round-2 protocol tables' "OPQ below PQ" quirk
    was exactly this)."""
    rng = np.random.default_rng(seed)
    if corr:
        # energy concentrated in ~d/4 effective dims, like real data
        spec = np.exp(-4.0 * np.arange(d) / d).astype(np.float32)
        spec *= np.sqrt(d / (spec ** 2).sum())   # keep E|x|^2 = d
        R, _ = np.linalg.qr(rng.standard_normal((d, d)))
        R = R.astype(np.float32)
    else:
        spec, R = np.ones(d, np.float32), np.eye(d, dtype=np.float32)
    centers = (rng.standard_normal((ncenters, d)).astype(np.float32)
               * spec)

    def draw(n):
        a = rng.integers(0, ncenters, n)
        z = (centers[a] + noise * spec
             * rng.standard_normal((n, d)).astype(np.float32))
        return (z @ R).astype(np.float32)

    Xt, Xb = draw(ntrain), draw(nbase)
    Xq = (Xb[rng.integers(0, nbase, nquery)]
          + 0.5 * noise * rng.standard_normal((nquery, d))
          ).astype(np.float32)
    return Dataset(name, Xt, Xb, Xq, exact_ground_truth(Xq, Xb))


def exact_ground_truth(Xq: np.ndarray, Xb: np.ndarray,
                       ncand: int = 32) -> np.ndarray:
    """True-NN id per query — the oracle every recall number is scored
    against. Two-pass exact: an accelerator f32 scan (HIGHEST matmul
    precision) collects ``ncand`` candidates per query, then float64 on
    host refines the winner among them. The f64 refinement makes the
    result independent of f32 rounding whenever the true NN lands in
    the candidate set — guaranteed unless the f32 top-``ncand`` margin
    is below f32 resolution, which a margin assertion rejects (falls
    back to the pure-f64 host scan for those queries).

    (The previous host-only float64 brute force took ~45 min per
    SIFT1M-shape protocol run on this container's 3.4 GFLOP/s numpy;
    this path is ~2 s on a chip and exact.)"""
    import jax
    import jax.numpy as jnp
    from jax import lax

    nquery, d = Xq.shape
    n = Xb.shape[0]
    ncand = min(ncand, n)
    # NOTE: the base array must be a jit ARGUMENT, not a closure —
    # closed-over arrays are baked into the HLO as constants, and the
    # axon remote-compile endpoint rejects >~100 MB request bodies
    # (HTTP 413) besides re-shipping the base per compile.
    Xbj = jnp.asarray(Xb, jnp.float32)
    b2 = jnp.sum(Xbj * Xbj, axis=1)

    @jax.jit
    def topc(q, XbT, b2):
        s = b2[None, :] - 2.0 * lax.dot_general(
            q, XbT, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)
        neg, idx = lax.top_k(-s, ncand)
        return -neg, idx

    XbT = Xbj.T

    gt = np.empty(nquery, np.int64)
    chunk = max(1, min(4096, (1 << 28) // max(n, 1) or 1))
    for s in range(0, nquery, chunk):
        q = jnp.asarray(Xq[s:s + chunk], jnp.float32)
        d32, idx = (np.asarray(a) for a in topc(q, XbT, b2))
        # f64 refinement over the candidates
        cand = Xb[idx].astype(np.float64)            # (cq, ncand, d)
        qd = Xq[s:s + chunk].astype(np.float64)
        d64 = ((cand - qd[:, None, :]) ** 2).sum(-1)
        best = np.argmin(d64, axis=1)
        gt[s:s + chunk] = idx[np.arange(idx.shape[0]), best]
        if ncand < n:
            # certify: the f64 winner must beat the f32 boundary by
            # more than the f32 error bound, else host-rescan exactly.
            # d32 is |b|^2 - 2qb (no |q|^2 term); put d64 on that scale.
            q2 = (qd ** 2).sum(-1)
            err = 1e-4 * np.maximum(1.0, np.abs(d32[:, -1]))
            unsafe = np.nonzero(
                d64[np.arange(len(best)), best] - q2
                > d32[:, -1] - err)[0]
            for u in unsafe:
                qrow = Xq[s + u].astype(np.float64)
                d2 = ((Xb.astype(np.float64) - qrow) ** 2).sum(1)
                gt[s + u] = int(np.argmin(d2))
    return gt.astype(np.int32)


def read_dataset(name: str, ntrain: int = 100_000,
                 nbase: int | None = None, nquery: int = 10_000,
                 **synth_kw) -> Dataset:
    """Load a catalog dataset (reference `src/read_datasets.jl:4-244`).

    ``synthetic`` / ``synthetic-small`` need no files; TEXMEX/HDF5 names
    read from ``$RAYUELA_DATA``. ``nbase=None`` takes the dataset's
    defining size where one exists (SIFT10M → 10M base vectors from the
    SIFT1B file; its ground truth is only valid at that size) and 1M
    otherwise."""
    name = name.lower()
    if name.startswith("synthetic"):
        if "corr" in name:
            synth_kw.setdefault("corr", True)
        if name.endswith("-small"):
            synth_kw.setdefault("d", 32)
            return make_synthetic(ntrain=2_000, nbase=20_000, nquery=200,
                                  name=name, **synth_kw)
        return make_synthetic(ntrain=ntrain, nbase=nbase or 1_000_000,
                              nquery=nquery, name=name, **synth_kw)
    if name in _TEXMEX:
        if nbase is None:
            nbase = _TEXMEX[name].get("nbase", 1_000_000)
        return _load_texmex(name, ntrain, nbase, nquery)
    if name in _HDF5:
        return _load_hdf5(name, ntrain, nbase or 1_000_000, nquery)
    raise ValueError(f"unknown dataset {name!r}; known: "
                     f"{sorted(_TEXMEX) + sorted(_HDF5)} + synthetic*")
