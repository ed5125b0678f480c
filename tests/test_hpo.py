"""HPO module tests (search space + optimizer protocol; the expensive
default_objective is exercised by the experiments suite's methods)."""

import numpy as np

from rayuela_tpu.experiments.hpo import (INCUMBENTS, LSQConfig, optimize,
                                         sample_config)


def test_sample_config_in_space():
    rng = np.random.default_rng(0)
    for _ in range(100):
        c = sample_config(rng, m=7)
        assert 1 <= c.ilsiter <= 16
        assert 1 <= c.npert <= 7
        assert c.method in ("LSQ", "SR_C", "SR_D")
        assert c.schedule in (1, 2, 3)
        assert 0.1 <= c.p <= 1.0
        assert c.icmiter == max(1, 32 // c.ilsiter)


def test_optimize_finds_planted_optimum():
    """Objective minimized at ilsiter=12, p≈0.3 — optimizer must get
    close within budget."""
    def objective(c: LSQConfig) -> float:
        return abs(c.ilsiter - 12) / 16 + abs(c.p - 0.3)

    best, loss, hist = optimize(objective, m=7, budget=40, seed=1,
                                verbose=False)
    assert len(hist) == 40
    assert loss < 0.25
    assert abs(best.ilsiter - 12) <= 3


def test_incumbents_match_reference_protocol():
    assert INCUMBENTS["sift1m"].method == "SR_D"
    assert INCUMBENTS["labelme22k"].method == "SR_C"
    assert all(c.icmiter == 4 for c in INCUMBENTS.values())
