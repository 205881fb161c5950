"""Pest-control + RNA inverse-fold task tests."""

import numpy as np
import pytest

from hebo_tpu.tasks.pest import PestControlTask
from hebo_tpu.tasks.rna import (
    RNAInverseFoldTask, nussinov_fold, structure_distance,
)


def test_pest_control_deterministic_and_sensible():
    task = PestControlTask(n_stations=10, seed=0)
    df = task.space.sample(6, seed=0)
    y1, y2 = task(df), task(df)
    np.testing.assert_array_equal(y1, y2)  # common random numbers
    # doing nothing everywhere should cost more than full strong control
    none_df = task.space.inverse_transform(np.zeros((1, 10)))
    strong_df = task.space.inverse_transform(np.full((1, 10), 4.0))
    assert task(none_df)[0, 0] > task(strong_df)[0, 0]


def test_nussinov_fold_pairs():
    s = nussinov_fold("GGGGAAAACCCC")
    assert s.count("(") == s.count(")")
    assert s.count("(") >= 3  # strong G-C stem exists
    # balanced and non-crossing by construction: check balance
    depth = 0
    for ch in s:
        depth += ch == "("
        depth -= ch == ")"
        assert depth >= 0
    assert depth == 0


def test_rna_inverse_fold_with_bo():
    from hebo_tpu.optimizers.bo_builder import BoBuilder

    task = RNAInverseFoldTask(target="((((...))))")
    opt = BoBuilder(
        "gp_to", "ls", "ei", "none", model_kwargs={"num_epochs": 8}
    ).build_bo(task.space, n_init=6)
    best = np.inf
    for _ in range(4):
        rec = opt.suggest(2)
        y = task(rec)
        best = min(best, float(y.min()))
        opt.observe(rec, y)
    assert np.isfinite(opt.best_y)
    assert best <= task.length  # sanity; usually much lower


def test_structure_distance():
    assert structure_distance("(((...)))", "(((...)))") == 0
    assert structure_distance("(((...)))", ".((...)).") == 2
