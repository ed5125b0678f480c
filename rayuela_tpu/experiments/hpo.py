"""Hyperparameter search for LSQ/LSQ++ — the reference's SMAC layer.

Capability parity with `smac/configure.py` (:79-98 search space, :31-68
objective) and `smac/test_lsq.jl`: optimize
``{ilsiter ∈ [1,16], npert ∈ [1,m], randord ∈ {0,1}, method ∈
{LSQ, SR_C, SR_D}, schedule ∈ {1,2,3}, p ∈ [0.1, 1.0]}`` minimizing
``1 - recall@1``, with ``icmiter = 32 // ilsiter`` so every
configuration does equal ICM work (`smac/configure.py:48`).

The reference shells out to the SMAC3 Python package through pyjulia;
here the optimizer is self-contained: random search plus a simple
surrogate-free "halving" refinement (top quartile re-evaluated on more
trials). No external dependency, identical protocol surface.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import numpy as np


@dataclasses.dataclass(frozen=True)
class LSQConfig:
    ilsiter: int = 8
    npert: int = 4
    randord: bool = True
    method: str = "SR_D"      # LSQ | SR_C | SR_D
    schedule: int = 1
    p: float = 0.5

    @property
    def icmiter(self) -> int:
        """Equal-work coupling (`smac/configure.py:48`)."""
        return max(1, 32 // self.ilsiter)


def sample_config(rng: np.random.Generator, m: int) -> LSQConfig:
    """Draw from the reference search space (`smac/configure.py:79-98`)."""
    method = rng.choice(["LSQ", "SR_C", "SR_D"])
    return LSQConfig(
        ilsiter=int(rng.integers(1, 17)),
        npert=int(rng.integers(1, m + 1)),
        randord=bool(rng.integers(0, 2)),
        method=str(method),
        schedule=int(rng.integers(1, 4)),
        p=float(rng.uniform(0.1, 1.0)),
    )


def default_objective(ds, m: int, h: int, niter: int, seed: int = 0,
                      knn: int = 100) -> Callable[[LSQConfig], float]:
    """1 - recall@1 of a full train→encode→search run of the config —
    the quantity SMAC minimizes (`smac/configure.py:31-68`)."""
    import jax

    from rayuela_tpu.experiments.drivers import experiment_lsq, experiment_sr

    def objective(cfg: LSQConfig) -> float:
        key = jax.random.PRNGKey(seed)
        kw = dict(niter=niter, knn=knn, verbose=False,
                  ilsiter=cfg.ilsiter, icmiter=cfg.icmiter,
                  npert=cfg.npert, randord=cfg.randord)
        if cfg.method == "LSQ":
            out = experiment_lsq(key, ds, m, h, **kw)
        else:
            out = experiment_sr(key, ds, m, h, method=cfg.method,
                                schedule=cfg.schedule, p=cfg.p, **kw)
        return float(1.0 - out["recall"][0])

    return objective


def optimize(objective: Callable[[LSQConfig], float], m: int,
             budget: int = 20, seed: int = 0, refine_frac: float = 0.25,
             verbose: bool = True) -> tuple[LSQConfig, float, list]:
    """Random search + top-quartile refinement.

    Returns ``(best_config, best_loss, history)`` where history is a
    list of (config, loss) in evaluation order."""
    rng = np.random.default_rng(seed)
    n_explore = max(1, math.ceil(budget * (1 - refine_frac)))
    history: list[tuple[LSQConfig, float]] = []

    for i in range(n_explore):
        cfg = sample_config(rng, m)
        loss = objective(cfg)
        history.append((cfg, loss))
        if verbose:
            print(f"[hpo {i + 1}/{budget}] loss={loss:.4f} {cfg}")

    # refinement: jitter the best configs' continuous/int params
    history.sort(key=lambda t: t[1])
    seeds = [c for c, _ in history[: max(1, len(history) // 4)]]
    for i in range(budget - n_explore):
        base = seeds[i % len(seeds)]
        cfg = dataclasses.replace(
            base,
            ilsiter=int(np.clip(base.ilsiter + rng.integers(-2, 3), 1, 16)),
            npert=int(np.clip(base.npert + rng.integers(-1, 2), 1, m)),
            p=float(np.clip(base.p + rng.normal(0, 0.1), 0.1, 1.0)),
        )
        loss = objective(cfg)
        history.append((cfg, loss))
        if verbose:
            print(f"[hpo {n_explore + i + 1}/{budget}] "
                  f"loss={loss:.4f} {cfg} (refine)")

    best_cfg, best_loss = min(history, key=lambda t: t[1])
    return best_cfg, best_loss, history


# Tuned incumbents the reference recorded after its SMAC runs
# (`smac/test_lsq.jl:208-226`) — sensible defaults per dataset family.
INCUMBENTS = {
    "sift1m": LSQConfig(ilsiter=8, npert=4, randord=True,
                        method="SR_D", schedule=1, p=0.5),
    "labelme22k": LSQConfig(ilsiter=8, npert=4, randord=True,
                            method="SR_C", schedule=1, p=0.5),
    "mnist": LSQConfig(ilsiter=8, npert=4, randord=True,
                       method="SR_D", schedule=1, p=0.5),
}
