"""Optimizer loop tests — reference HEBO/test/test_optimizer.py style:
small mixed space, few iterations, an inf y injected for robustness."""

import numpy as np
import pandas as pd
import pytest

from hebo_tpu import DesignSpace, HEBO
from hebo_tpu.tasks import Ackley, Branin

MIXED = [
    {"name": "x0", "type": "num", "lb": -3, "ub": 3},
    {"name": "x1", "type": "int", "lb": 0, "ub": 6},
    {"name": "c", "type": "cat", "categories": ["a", "b", "c"]},
]


def _obj(df):
    base = df["x0"].values.astype(float) ** 2 + 0.3 * df["x1"].values.astype(float)
    base = base + np.where(df["c"].values == "b", -1.0, 0.0)
    return base.reshape(-1, 1)


@pytest.mark.parametrize("n_suggestions", [1, 4])
def test_hebo_mixed_loop(n_suggestions):
    space = DesignSpace(MIXED)
    opt = HEBO(space, model_config={"num_epochs": 10}, pop=24, iters=10)
    for it in range(6):
        rec = opt.suggest(n_suggestions)
        assert isinstance(rec, pd.DataFrame)
        assert len(rec) == n_suggestions
        assert list(rec.columns) == space.param_order
        y = _obj(rec)
        if it == 3:
            y[0, 0] = np.inf  # robustness: reference injects inf mid-run
        opt.observe(rec, y)
    assert np.isfinite(opt.best_y)
    assert opt.num_obs == 6 * n_suggestions


def test_hebo_improves_on_branin():
    task = Branin()
    opt = HEBO(task.space, model_config={"num_epochs": 20}, pop=32, iters=20)
    for _ in range(10):
        rec = opt.suggest(4)
        opt.observe(rec, task(rec))
    init_best = float(np.min(opt.y[:8]))
    assert opt.best_y <= init_best
    assert opt.best_y < 8.0  # random-mean is ~55 on Branin


def test_hebo_batch_unique():
    space = DesignSpace(MIXED)
    opt = HEBO(space, model_config={"num_epochs": 10}, pop=24, iters=10)
    for _ in range(5):
        rec = opt.suggest(4)
        opt.observe(rec, _obj(rec))
    rec = opt.suggest(8)
    assert len(rec) == 8


def test_hebo_contextual_fix_input():
    space = DesignSpace(MIXED)
    opt = HEBO(space, model_config={"num_epochs": 10}, pop=24, iters=10)
    for _ in range(5):
        rec = opt.suggest(2, fix_input={"c": "a"})
        assert (rec["c"] == "a").all()
        opt.observe(rec, _obj(rec))


def test_best_x_consistency():
    space = DesignSpace(MIXED)
    opt = HEBO(space, model_config={"num_epochs": 10}, pop=24, iters=10)
    for _ in range(4):
        rec = opt.suggest(3)
        opt.observe(rec, _obj(rec))
    bx = opt.best_x
    by = opt.best_y
    np.testing.assert_allclose(_obj(bx)[0, 0], by, rtol=1e-9)
