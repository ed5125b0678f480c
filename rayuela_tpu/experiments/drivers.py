"""Experiment drivers — the train/query/base protocol over all methods.

Equivalent of the reference's ``experiment_*`` functions (inside each
quantizer file, e.g. `src/PQ.jl:104-132`, `src/OPQ.jl:143-197`,
`src/RVQ.jl:125-188`, `src/ERVQ.jl:151-242`, `src/LSQ.jl:383-476`,
`src/SR.jl:178-402`) and the pipeline scripts
`demos/demos_train_query_base.jl` / `demos/demos_query_base.jl`:

* train on ``Xt``, encode the base set, ADC-scan the queries
  (knn=1000), evaluate recall@N, persist the trial to the HDF5 store;
* orthogonal methods (PQ/OPQ) use ``m`` codebooks; non-orthogonal
  (RVQ/ERVQ/ChainQ/LSQ/SR) use ``m-1`` plus one quantized-norms byte at
  equal bits-per-vector (`demos/demos_train_query_base.jl:41-47`);
* staged initialization OPQ → ChainQ → LSQ/SR, with each stage's
  output checkpointed and reloadable (`:31-58`).

One addition over the reference: ``experiment_chainq`` actually exists
(the reference exports but never defines it — SURVEY.md §2.6).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rayuela_tpu.experiments.datasets import Dataset, read_dataset
from rayuela_tpu.experiments.store import save_results
from rayuela_tpu.models.chainq import quantize_chainq, train_chainq
from rayuela_tpu.models.ervq import train_ervq_from_scratch
from rayuela_tpu.models.lsq import train_lsq
from rayuela_tpu.models.opq import train_opq, quantize_opq
from rayuela_tpu.models.pq import train_pq, quantize_pq
from rayuela_tpu.models.rvq import quantize_rvq, train_rvq
from rayuela_tpu.models.sr import train_sr
from rayuela_tpu.ops.icm import encoding_icm
from rayuela_tpu.ops.qerror import qerror
from rayuela_tpu.search.linscan import (eval_recall, linscan_lsq,
                                        linscan_opq, linscan_pq)
from rayuela_tpu.search.norms import get_norms_codebook, quantize_norms

Array = jax.Array


def _finish_nonorth(key, name, C, B, Xb_codes, R, ds: Dataset,
                    train_error, knn, verbose, store, trial):
    """Shared tail for non-orthogonal methods: norms codebook from the
    TRAIN codes, base norms quantization, LUT+norms scan, recall."""
    norms_codes_t, norms_cbook = get_norms_codebook(key, C, B)
    base_norm_codes, _ = quantize_norms(C, Xb_codes, norms_cbook)
    dists, ids = linscan_lsq(C, jnp.asarray(ds.Xq), Xb_codes,
                             norms_cbook, base_norm_codes, R=R, k=knn)
    recall = eval_recall(ids, ds.gt, verbose=verbose)
    if store is not None:
        save_results(store, trial, C=np.asarray(C), B=np.asarray(B),
                     train_error=train_error,
                     R=None if R is None else np.asarray(R),
                     B_base=np.asarray(Xb_codes), recall=recall,
                     norms_codebook=np.asarray(norms_cbook),
                     norms_codes=np.asarray(base_norm_codes))
    return dict(name=name, C=C, B=B, R=R, B_base=Xb_codes,
                train_error=float(train_error), recall=recall)


def experiment_pq(key, ds: Dataset, m: int = 8, h: int = 256,
                  niter: int = 25, knn: int = 1000, verbose: bool = True,
                  store: str | None = None, trial: int = 0):
    """Reference `src/PQ.jl:104-132`."""
    model, B, err = train_pq(key, jnp.asarray(ds.Xt), m, h, iters=niter)
    Bb = quantize_pq(model, jnp.asarray(ds.Xb))
    _, ids = linscan_pq(model.codebooks, jnp.asarray(ds.Xq), Bb, k=knn)
    recall = eval_recall(ids, ds.gt, verbose=verbose)
    if store is not None:
        save_results(store, trial, C=np.asarray(model.codebooks),
                     B=np.asarray(B), train_error=float(err),
                     B_base=np.asarray(Bb), recall=recall)
    return dict(name="pq", model=model, B=B, B_base=Bb,
                train_error=float(err), recall=recall)


def experiment_opq(key, ds: Dataset, m: int = 8, h: int = 256,
                   niter: int = 25, knn: int = 1000,
                   verbose: bool = True, store: str | None = None,
                   trial: int = 0):
    """Reference `src/OPQ.jl:143-197`."""
    model, B, obj = train_opq(key, jnp.asarray(ds.Xt), m, h, niter=niter)
    Bb = quantize_opq(model, jnp.asarray(ds.Xb))
    _, ids = linscan_opq(model.codebooks, jnp.asarray(ds.Xq), Bb,
                         model.R, k=knn)
    recall = eval_recall(ids, ds.gt, verbose=verbose)
    if store is not None:
        save_results(store, trial, C=np.asarray(model.codebooks),
                     B=np.asarray(B), R=np.asarray(model.R),
                     train_error=float(obj[-1]), B_base=np.asarray(Bb),
                     recall=recall)
    return dict(name="opq", model=model, B=B, B_base=Bb, R=model.R,
                train_error=float(obj[-1]), recall=recall,
                obj=np.asarray(obj))


def experiment_rvq(key, ds: Dataset, m: int = 7, h: int = 256,
                   niter: int = 25, knn: int = 1000,
                   verbose: bool = True, store: str | None = None,
                   trial: int = 0):
    """Reference `src/RVQ.jl:125-188`."""
    model, B, err = train_rvq(key, jnp.asarray(ds.Xt), m, h, niter=niter)
    Bb, _ = quantize_rvq(model, jnp.asarray(ds.Xb))
    return _finish_nonorth(key, "rvq", model.codebooks, B, Bb, None, ds,
                           float(err), knn, verbose, store, trial)


def experiment_ervq(key, ds: Dataset, m: int = 7, h: int = 256,
                    niter: int = 25, knn: int = 1000,
                    verbose: bool = True, store: str | None = None,
                    trial: int = 0):
    """Reference `src/ERVQ.jl:151-242` (RVQ init inside train_ervq)."""
    model, B, err = train_ervq_from_scratch(key, jnp.asarray(ds.Xt), m, h,
                                            niter=niter)
    Bb, _ = quantize_rvq(model.codebooks, jnp.asarray(ds.Xb))
    return _finish_nonorth(key, "ervq", model.codebooks, B, Bb, None, ds,
                           float(err), knn, verbose, store, trial)


def experiment_chainq(key, ds: Dataset, m: int = 7, h: int = 256,
                      niter: int = 25, knn: int = 1000,
                      verbose: bool = True, store: str | None = None,
                      trial: int = 0, opq_init=None, mesh=None):
    """ChainQ end-to-end (exported-but-undefined in the reference;
    defined here per SURVEY.md §2.6). OPQ init per
    `demos/demos_train_query_base.jl:52-58`. With ``mesh``, training
    and the base Viterbi encode run data-parallel
    (`parallel.chainq_sharded`; reference worker farm
    `src/ChainQ.jl:334-344`)."""
    if opq_init is None:
        opq_model, B_opq, _ = train_opq(key, jnp.asarray(ds.Xt), m, h,
                                        niter=niter)
        opq_init = (B_opq, opq_model.R)
    if mesh is not None:
        from rayuela_tpu.parallel.chainq_sharded import (
            sharded_viterbi_encode, train_chainq_sharded)
        model, B, obj = train_chainq_sharded(
            mesh, jnp.asarray(ds.Xt), opq_init[0], opq_init[1], h=h,
            niter=niter)
        RXb = jnp.matmul(jnp.asarray(ds.Xb), model.R,
                         preferred_element_type=jnp.float32)
        Bb = sharded_viterbi_encode(mesh, RXb, model.codebooks)
    else:
        model, B, obj = train_chainq(jnp.asarray(ds.Xt), opq_init[0],
                                     opq_init[1], h=h, niter=niter)
        Bb = quantize_chainq(model, jnp.asarray(ds.Xb))
    out = _finish_nonorth(key, "chainq", model.codebooks, B, Bb,
                          model.R, ds, float(obj[-1]), knn, verbose,
                          store, trial)
    out["obj"] = np.asarray(obj)
    return out


def _lsq_family(key, ds, m, h, niter, knn, verbose, store, trial,
                trainer: Callable, name: str, chain_init,
                ilsiter, icmiter, npert, randord, chunk, mesh=None,
                schedule: int = 1, p: float = 0.5):
    if chain_init is None:
        opq_model, B_opq, _ = train_opq(key, jnp.asarray(ds.Xt), m, h,
                                        niter=niter)
        if mesh is not None:
            from rayuela_tpu.parallel.chainq_sharded import (
                train_chainq_sharded)
            cq_model, B_cq, _ = train_chainq_sharded(
                mesh, jnp.asarray(ds.Xt), B_opq, opq_model.R, h=h,
                niter=niter)
        else:
            cq_model, B_cq, _ = train_chainq(jnp.asarray(ds.Xt), B_opq,
                                             opq_model.R, h=h,
                                             niter=niter)
        chain_init = (B_cq, cq_model.R)
    B0, R0 = chain_init
    if mesh is not None:
        from rayuela_tpu.parallel.lsq_sharded import (
            train_lsq_family_sharded)
        meth = {"lsq": "LSQ", "sr-c": "SR_C", "sr-d": "SR_D"}[name]
        model, B, obj = train_lsq_family_sharded(
            mesh, key, jnp.asarray(ds.Xt), B0, R0, h=h, niter=niter,
            ilsiter=ilsiter, icmiter=icmiter, npert=npert,
            randord=randord, method=meth, schedule=schedule, p=p,
            chunk=chunk)
    else:
        model, B, obj = trainer(key, jnp.asarray(ds.Xt), B0, R0, h=h,
                                niter=niter, ilsiter=ilsiter,
                                icmiter=icmiter, npert=npert,
                                randord=randord, chunk=chunk)
    # Base encode: greedy sequential init + 4x ILS budget. The
    # reference inits from RANDOM codes (`src/SR.jl:283-287`,
    # `src/LSQ.jl:438-440`); greedy costs one extra pass and starts ILS
    # orders of magnitude closer to the training optimum (random-init
    # ILS can plateau far above train error on hard data).
    kb, ke = jax.random.split(jax.random.fold_in(key, 7))
    from rayuela_tpu.models.rvq import quantize_rvq
    Bb0, _ = quantize_rvq(model.codebooks, jnp.asarray(ds.Xb))
    if mesh is not None:
        from rayuela_tpu.parallel.lsq_sharded import sharded_encoding_icm
        Bb = sharded_encoding_icm(mesh, ke, jnp.asarray(ds.Xb),
                                  model.codebooks, Bb0,
                                  ilsiter=ilsiter * 4, icmiter=icmiter,
                                  npert=npert, randord=randord,
                                  chunk=chunk)
    else:
        Bb = encoding_icm(ke, jnp.asarray(ds.Xb), model.codebooks, Bb0,
                          ilsiter=ilsiter * 4, icmiter=icmiter,
                          npert=npert, randord=randord, chunk=chunk)
    base_error = float(qerror(jnp.asarray(ds.Xb), model.codebooks, Bb))
    if verbose:
        print(f"{name}: train {float(obj[-1]):.5g} base {base_error:.5g}")
    out = _finish_nonorth(key, name, model.codebooks, B, Bb, None, ds,
                          float(obj[-1]), knn, verbose, store, trial)
    out["obj"] = np.asarray(obj)
    out["base_error"] = base_error
    return out


def experiment_lsq(key, ds: Dataset, m: int = 7, h: int = 256,
                   niter: int = 25, knn: int = 1000,
                   verbose: bool = True, store: str | None = None,
                   trial: int = 0, chain_init=None, ilsiter: int = 8,
                   icmiter: int = 4, npert: int = 4,
                   randord: bool = True, chunk: int = 8192, mesh=None):
    """Reference `src/LSQ.jl:383-476`."""
    return _lsq_family(key, ds, m, h, niter, knn, verbose, store, trial,
                       train_lsq, "lsq", chain_init, ilsiter, icmiter,
                       npert, randord, chunk, mesh=mesh)


def experiment_sr(key, ds: Dataset, m: int = 7, h: int = 256,
                  niter: int = 25, knn: int = 1000, verbose: bool = True,
                  store: str | None = None, trial: int = 0,
                  chain_init=None, ilsiter: int = 8, icmiter: int = 4,
                  npert: int = 4, randord: bool = True,
                  method: str = "SR_D", schedule: int = 1,
                  p: float = 0.5, chunk: int = 8192, mesh=None):
    """Reference `src/SR.jl:178-402` (CPU/CUDA variants unified)."""
    def trainer(key, X, B0, R0, **kw):
        return train_sr(key, X, B0, R0, method=method,
                        schedule=schedule, p=p, **kw)
    return _lsq_family(key, ds, m, h, niter, knn, verbose, store, trial,
                       trainer, f"sr-{method[-1].lower()}", chain_init,
                       ilsiter, icmiter, npert, randord, chunk,
                       mesh=mesh, schedule=schedule, p=p)


def experiment_compq(key, ds: Dataset, m: int = 7, h: int = 256,
                     niter: int = 25, knn: int = 1000,
                     verbose: bool = True, store: str | None = None,
                     trial: int = 0, H: int = 16, lr_total: float = 0.01,
                     update: str = "sgd"):
    """CompQ end-to-end: RVQ init → competitive training → beam base
    encode → norms-byte scan. Reference `demos/demo_compq.jl` +
    `src/CompetitiveQ.jl:138-221` (which is bit-rotted there; this one
    runs and produces a recall row like every other method)."""
    from rayuela_tpu.models.compq import quantize_compq, train_compq

    rvq_model, B0, _ = train_rvq(key, jnp.asarray(ds.Xt), m, h,
                                 niter=niter)
    model, B, obj = train_compq(jnp.asarray(ds.Xt), rvq_model.codebooks,
                                B0, niter=niter, H=H, lr_total=lr_total,
                                update=update)
    Bb, _ = quantize_compq(model, jnp.asarray(ds.Xb), H=H)
    out = _finish_nonorth(key, "compq", model.codebooks, B, Bb, None,
                          ds, float(obj[-1]), knn, verbose, store, trial)
    out["obj"] = np.asarray(obj)
    return out


ALL_METHODS = ("pq", "opq", "rvq", "ervq", "chainq", "lsq", "sr_c",
               "sr_d", "compq")


def run_query_base(dataset: str | Dataset, m: int = 8, h: int = 256,
                   niter: int = 25, ntrials: int = 10, knn: int = 1000,
                   methods=ALL_METHODS, results_dir: str = "results",
                   verbose: bool = True, seed: int = 0, **exp_kw):
    """The query==base protocol of `demos/demos_query_base.jl`
    (LabelMe22K / MNIST): the training set IS the base set — queries
    are searched against the training codes directly, over ``ntrials``
    repetitions (the reference uses 10, `:15`)."""
    from rayuela_tpu.experiments.datasets import exact_ground_truth

    ds = read_dataset(dataset) if isinstance(dataset, str) else dataset
    gt = ds.gt
    if not (ds.Xb.shape == ds.Xt.shape and np.array_equal(ds.Xb, ds.Xt)):
        # the dataset's gt indexes Xb; once the searched base becomes
        # Xt it must be recomputed (LabelMe/MNIST files have Xb == Xt,
        # synthetic and most others do not)
        gt = exact_ground_truth(ds.Xq, ds.Xt)
    ds = Dataset(ds.name, ds.Xt, ds.Xt, ds.Xq, gt)
    return run_train_query_base(ds, m=m, h=h, niter=niter,
                                ntrials=ntrials, knn=knn,
                                methods=methods, results_dir=results_dir,
                                verbose=verbose, seed=seed, **exp_kw)


def high_recall_experiment(key, ds: Dataset, m: int = 7, h: int = 256,
                           niter: int = 25,
                           ilsiters=(1, 2, 4, 8, 16, 32, 64),
                           knn: int = 1000, verbose: bool = True,
                           method: str = "SR_D", **sr_kw):
    """Recall as a function of the base-encoding ILS budget — the
    reference's ``high_recall_experiments``
    (`demos/demos_train_query_base.jl:98-158`). Returns
    ``{ilsiter: recall_curve}``."""
    from rayuela_tpu.ops.icm import encoding_icm_checkpoints

    opq_model, B_opq, _ = train_opq(key, jnp.asarray(ds.Xt), m, h,
                                    niter=niter)
    cq_model, B_cq, _ = train_chainq(jnp.asarray(ds.Xt), B_opq,
                                     opq_model.R, h=h, niter=niter)
    model, B, _ = train_sr(key, jnp.asarray(ds.Xt), B_cq, cq_model.R,
                           h=h, niter=niter, method=method, **sr_kw)
    kb, ke = jax.random.split(jax.random.fold_in(key, 11))
    nb = ds.Xb.shape[0]
    Bb0 = jax.random.randint(kb, (nb, B.shape[1]), 0, h, jnp.int32)
    snaps = encoding_icm_checkpoints(ke, jnp.asarray(ds.Xb),
                                     model.codebooks, Bb0,
                                     ilsiters=ilsiters)
    out = {}
    for ils, Bb in zip(sorted(ilsiters), snaps):
        norms_codes_t, norms_cbook = get_norms_codebook(
            key, model.codebooks, B)
        bnorm, _ = quantize_norms(model.codebooks, Bb, norms_cbook)
        _, ids = linscan_lsq(model.codebooks, jnp.asarray(ds.Xq), Bb,
                             norms_cbook, bnorm, k=knn)
        out[ils] = eval_recall(ids, ds.gt, verbose=False)
        if verbose:
            print(f"ilsiter={ils}: r@1={out[ils][0]:.4f}")
    return out


def run_train_query_base(dataset: str | Dataset = "sift1m", m: int = 8,
                         h: int = 256, niter: int = 25,
                         ntrials: int = 1, knn: int = 1000,
                         methods=ALL_METHODS, results_dir: str = "results",
                         verbose: bool = True, seed: int = 0,
                         resume: bool = False, mesh=None, config=None,
                         **exp_kw):
    """The full protocol of `demos/demos_train_query_base.jl:9-96`:
    every method at equal bits-per-vector (PQ/OPQ: m codebooks;
    non-orthogonal: m-1 + norms byte), staged OPQ→ChainQ→LSQ/SR init
    shared within a trial, results per (dataset, method) HDF5 file.

    ``resume=True`` reproduces the reference's crash-recovery behavior
    (`demos/demos_train_query_base.jl:31-58`): (method, trial) pairs
    already in the store are skipped, and a completed ChainQ stage is
    reloaded from HDF5 to re-seed the LSQ/SR stages.

    ``mesh`` routes ChainQ and the LSQ family (train AND base encode)
    through the `rayuela_tpu.parallel` sharded steps — the protocol's
    expensive stages run data-parallel across the mesh's chips, the
    way the reference ran every experiment over `addprocs` workers
    (`src/Rayuela.jl:10,31`).

    ``config`` selects the LSQ-family hyperparameters:
    ``"incumbent"`` looks up the reference's SMAC-recorded incumbent
    for ``(dataset, m)`` (`rayuela_tpu.experiments.hpo.INCUMBENTS`,
    transcribed from `smac/test_lsq.jl:208-226`; unknown datasets fall
    back to the defaults), or pass an ``hpo.LSQConfig`` directly
    (e.g. your own campaign's winner). The incumbent's ilsiter /
    icmiter / npert / randord apply to LSQ and SR; schedule / p apply
    to SR only. Explicit keyword overrides still win."""
    import os

    from rayuela_tpu.experiments.store import list_trials, load_results
    ds = read_dataset(dataset) if isinstance(dataset, str) else dataset
    os.makedirs(results_dir, exist_ok=True)
    sr_extra: dict = {}
    if config is not None:
        from rayuela_tpu.experiments.hpo import LSQConfig, incumbent
        cfg = incumbent(ds.name, m) if config == "incumbent" else config
        if not isinstance(cfg, LSQConfig):
            raise ValueError(
                f"config={config!r}: 'incumbent' or an hpo.LSQConfig")
        if verbose:
            print(f"[config] LSQ-family hyperparameters: {cfg}")
        for k_, v_ in dict(ilsiter=cfg.ilsiter, icmiter=cfg.icmiter,
                           npert=cfg.npert,
                           randord=cfg.randord).items():
            exp_kw.setdefault(k_, v_)
        sr_extra = dict(schedule=cfg.schedule, p=cfg.p)
    ds_g = ds
    if mesh is not None:
        # methods WITHOUT explicit shard_map steps (PQ/OPQ/RVQ/ERVQ/
        # CompQ) run with Xt/Xb sharded over the ``data`` axis so GSPMD
        # inserts the collectives for their training statistics — the
        # same route as `api.train(mesh=)`. The explicitly-sharded
        # methods (ChainQ + LSQ family) keep the raw dataset and shard
        # inside their own steps.
        from rayuela_tpu.parallel.mesh import shard_data
        ds_g = ds._replace(Xt=shard_data(mesh, jnp.asarray(ds.Xt)),
                           Xb=shard_data(mesh, jnp.asarray(ds.Xb)))
    results: dict = {}
    for trial in range(ntrials):
        key = jax.random.PRNGKey(seed + trial)
        chain_init = None
        for method in methods:
            t0 = time.time()
            path = os.path.join(results_dir, f"{ds.name}_{method}.h5")
            if resume and trial in list_trials(path):
                saved = load_results(path, trial)
                if method == "chainq" and "R" in saved:
                    chain_init = (jnp.asarray(saved["B"]),
                                  jnp.asarray(saved["R"]))
                if verbose:
                    print(f"[trial {trial}] {method}: resumed from "
                          f"{path}")
                results.setdefault(method, []).append(
                    dict(name=method, recall=saved.get("recall"),
                         resumed=True))
                continue
            if method in ("pq", "opq"):
                fn = experiment_pq if method == "pq" else experiment_opq
                out = fn(key, ds_g, m, h, niter, knn, verbose, path,
                         trial)
            elif method == "rvq":
                out = experiment_rvq(key, ds_g, m - 1, h, niter, knn,
                                     verbose, path, trial)
            elif method == "ervq":
                out = experiment_ervq(key, ds_g, m - 1, h, niter, knn,
                                      verbose, path, trial)
            elif method == "chainq":
                out = experiment_chainq(key, ds, m - 1, h, niter, knn,
                                        verbose, path, trial, mesh=mesh)
                chain_init = (out["B"], out["R"])
            elif method == "lsq":
                out = experiment_lsq(key, ds, m - 1, h, niter, knn,
                                     verbose, path, trial,
                                     chain_init=chain_init, mesh=mesh,
                                     **exp_kw)
            elif method in ("sr_c", "sr_d"):
                out = experiment_sr(key, ds, m - 1, h, niter, knn,
                                    verbose, path, trial,
                                    chain_init=chain_init,
                                    method=method.upper(), mesh=mesh,
                                    **{**sr_extra, **exp_kw})
            elif method == "compq":
                out = experiment_compq(key, ds_g, m - 1, h, niter, knn,
                                       verbose, path, trial)
            else:
                raise ValueError(f"unknown method {method!r}")
            if verbose:
                print(f"[trial {trial}] {method}: r@1="
                      f"{out['recall'][0]:.4f} "
                      f"({time.time() - t0:.1f}s)")
            results.setdefault(method, []).append(out)
    return results
