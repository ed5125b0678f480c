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


# name → (train file, base file, query file, gt file, format)
_TEXMEX = {
    "sift1m": ("sift/sift_learn.fvecs", "sift/sift_base.fvecs",
               "sift/sift_query.fvecs", "sift/sift_groundtruth.ivecs",
               "fvecs"),
    "gist1m": ("gist/gist_learn.fvecs", "gist/gist_base.fvecs",
               "gist/gist_query.fvecs", "gist/gist_groundtruth.ivecs",
               "fvecs"),
    "sift1b": ("sift1b/bigann_learn.bvecs", "sift1b/bigann_base.bvecs",
               "sift1b/bigann_query.bvecs",
               "sift1b/gnd/idx_1000M.ivecs", "bvecs"),
    "deep1b": ("deep1b/learn.fvecs", "deep1b/base.fvecs",
               "deep1b/query.fvecs", "deep1b/groundtruth.ivecs",
               "fvecs"),
}

# HDF5-packaged sets (reference keeps these as .h5 with X/Q/gt keys)
_HDF5 = {
    "mnist": "mnist/mnist.h5",
    "labelme22k": "labelme/labelme.h5",
    "convnet1m": "convnet1m/convnet1m.h5",
    "deep1m": "deep/deep1m.h5",
}


def _load_texmex(name: str, ntrain: int, nbase: int, nquery: int
                 ) -> Dataset:
    tf, bf, qf, gf, fmt = _TEXMEX[name]
    root = data_root()
    rd = fvecs_read if fmt == "fvecs" else bvecs_read
    Xt = rd(os.path.join(root, tf), 0, ntrain).astype(np.float32)
    Xb = rd(os.path.join(root, bf), 0, nbase).astype(np.float32)
    Xq = rd(os.path.join(root, qf), 0, nquery).astype(np.float32)
    gt = ivecs_read(os.path.join(root, gf), 0, nquery)[:, 0]
    return Dataset(name, Xt, Xb, Xq, gt.astype(np.int32))


def _load_hdf5(name: str, ntrain: int, nbase: int, nquery: int
               ) -> Dataset:
    import h5py
    path = os.path.join(data_root(), _HDF5[name])
    with h5py.File(path, "r") as f:
        Xt = np.asarray(f["train"][:ntrain], np.float32)
        Xb = np.asarray(f["base"][:nbase], np.float32)
        Xq = np.asarray(f["query"][:nquery], np.float32)
        gt = np.asarray(f["groundtruth"][:nquery], np.int32).reshape(-1)
    return Dataset(name, Xt, Xb, Xq, gt)


def make_synthetic(d: int = 128, ntrain: int = 10_000,
                   nbase: int = 100_000, nquery: int = 1_000,
                   ncenters: int = 64, noise: float = 0.3,
                   seed: int = 0, name: str = "synthetic") -> Dataset:
    """Clustered Gaussian data with exact brute-force ground truth.

    Queries are perturbed base vectors so recall curves are meaningful
    at small scale."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((ncenters, d)).astype(np.float32)

    def draw(n):
        a = rng.integers(0, ncenters, n)
        return (centers[a]
                + noise * rng.standard_normal((n, d))).astype(np.float32)

    Xt, Xb = draw(ntrain), draw(nbase)
    Xq = (Xb[rng.integers(0, nbase, nquery)]
          + 0.5 * noise * rng.standard_normal((nquery, d))
          ).astype(np.float32)
    # exact NN by blocked brute force (float64 accumulate for stability)
    gt = np.empty(nquery, np.int64)
    b2 = (Xb.astype(np.float64) ** 2).sum(1)
    for s in range(0, nquery, 256):
        q = Xq[s:s + 256].astype(np.float64)
        d2 = b2[None, :] - 2.0 * q @ Xb.T.astype(np.float64)
        gt[s:s + 256] = np.argmin(d2, axis=1)
    return Dataset(name, Xt, Xb, Xq, gt.astype(np.int32))


def read_dataset(name: str, ntrain: int = 100_000, nbase: int = 1_000_000,
                 nquery: int = 10_000, **synth_kw) -> Dataset:
    """Load a catalog dataset (reference `src/read_datasets.jl:4-244`).

    ``synthetic`` / ``synthetic-small`` need no files; TEXMEX/HDF5 names
    read from ``$RAYUELA_DATA``."""
    name = name.lower()
    if name.startswith("synthetic"):
        if name == "synthetic-small":
            synth_kw.setdefault("d", 32)
            return make_synthetic(ntrain=2_000, nbase=20_000, nquery=200,
                                  name=name, **synth_kw)
        return make_synthetic(ntrain=ntrain, nbase=nbase, nquery=nquery,
                              name=name, **synth_kw)
    if name in _TEXMEX:
        return _load_texmex(name, ntrain, nbase, nquery)
    if name in _HDF5:
        return _load_hdf5(name, ntrain, nbase, nquery)
    raise ValueError(f"unknown dataset {name!r}; known: "
                     f"{sorted(_TEXMEX) + sorted(_HDF5)} + synthetic*")
