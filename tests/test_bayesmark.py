"""Bayesmark sklearn-HPO suite (reference: HEBO Bayesmark adapter
optimizers/util.py:1-38 + archived NeurIPS-2020 submission protocol)."""

import numpy as np
import pytest

from hebo_tpu.tasks.bayesmark import (
    BAYESMARK_API_CONFIGS,
    BayesmarkTask,
    normalized_score,
    suite,
)


def test_api_configs_parse_to_spaces():
    for model, cfg in BAYESMARK_API_CONFIGS.items():
        t = BayesmarkTask(model, "iris")
        assert t.space.num_cols == len(cfg)


@pytest.mark.parametrize("model", ["DT", "kNN", "lasso"])
def test_eval_returns_finite_losses(model):
    t = BayesmarkTask(model, "iris")
    df = t.space.sample(3, seed=0)
    y = t(df)
    assert y.shape == (3, 1)
    assert np.all(np.isfinite(y)), y.ravel()
    assert np.all(y >= 0)  # classification loss = 1 - accuracy


def test_int_params_coerced():
    # pandas rows upcast mixed dtypes to float64; estimator construction
    # must still receive ints (the bug class: sklearn rejects float max_depth)
    t = BayesmarkTask("DT", "iris")
    row = {"max_depth": 7.0, "min_samples_split": 0.1,
           "min_samples_leaf": 0.05, "max_features": 0.5}
    assert np.isfinite(t._eval_one(row))


def test_regression_dataset_mse_loss():
    t = BayesmarkTask("lasso", "diabetes")
    y = t(t.space.sample(2, seed=1))
    assert np.all(y > 0)  # MSE


def test_normalized_score_bounds():
    assert normalized_score(1.0, 1.0, 0.0) == 0.0
    assert normalized_score(0.0, 1.0, 0.0) == 100.0
    assert normalized_score(0.5, 0.5, 0.5) == 100.0  # degenerate denom


def test_suite_builds():
    tasks = suite(models=("kNN",), datasets=("iris",))
    assert len(tasks) == 1 and tasks[0].name == "kNN-iris"


def test_hebo_survives_all_failed_observations():
    # all-inf y: HEBO should keep quasi-sampling, not crash
    from hebo_tpu import HEBO

    t = BayesmarkTask("kNN", "iris")
    opt = HEBO(t.space)
    rec = opt.suggest(4)
    opt.observe(rec, np.full((len(rec), 1), np.inf))
    rec2 = opt.suggest(4)
    assert len(rec2) == 4
