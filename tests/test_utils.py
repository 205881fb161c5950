"""Utils subsystem tests: data buffer, results logger, checkpoint/resume,
experiment runner."""

import os

import numpy as np
import pytest

from hebo_tpu import DesignSpace, HEBO
from hebo_tpu.utils.checkpoint import load_optimizer, save_optimizer
from hebo_tpu.utils.data_buffer import DataBuffer
from hebo_tpu.utils.experiment import run_experiment
from hebo_tpu.utils.results_logger import ResultsLogger

CONT = [
    {"name": "x0", "type": "num", "lb": -2, "ub": 2},
    {"name": "x1", "type": "num", "lb": -2, "ub": 2},
]


def _quad(df):
    x = df[["x0", "x1"]].values.astype(float)
    return np.sum(x**2, axis=1, keepdims=True)


def test_data_buffer():
    buf = DataBuffer(num_dims=2, num_obj=1, num_constr=1)
    buf.append([[0.0, 1.0]], [[2.0, -1.0]])
    buf.append([[1.0, 1.0]], [[1.0, 0.5]])  # infeasible (constraint > 0)
    assert len(buf) == 2
    x, y = buf.best()
    assert y == 2.0  # only the feasible point counts
    d = buf.state_dict()
    buf2 = DataBuffer(2, 1, 1)
    buf2.load_state_dict(d)
    assert len(buf2) == 2


def test_results_logger_roundtrip(tmp_path):
    p = str(tmp_path / "res.csv")
    lg = ResultsLogger(save_path=p)
    lg.append([3.0, 1.0], suggest_time=0.5)
    lg.append([2.0], suggest_time=0.1)
    assert lg.frame["Best y"].iloc[-1] == 1.0
    lg2 = ResultsLogger.load(p)
    assert len(lg2.rows) == 3
    assert os.path.exists(p)


def test_checkpoint_resume(tmp_path):
    space = DesignSpace(CONT)
    opt = HEBO(space, model_config={"num_epochs": 8}, pop=16, iters=8)
    for _ in range(4):
        rec = opt.suggest(3)
        opt.observe(rec, _quad(rec))
    p = str(tmp_path / "ckpt.pkl")
    save_optimizer(opt, p)

    opt2 = HEBO(space, model_config={"num_epochs": 8}, pop=16, iters=8)
    load_optimizer(opt2, p)
    assert opt2.num_obs == opt.num_obs
    assert np.allclose(opt2.y, opt.y)
    assert opt2.best_y == opt.best_y
    # resumed optimizer continues working
    rec = opt2.suggest(2)
    opt2.observe(rec, _quad(rec))
    assert opt2.num_obs == opt.num_obs + 2


def test_run_experiment(tmp_path):
    space = DesignSpace(CONT)
    opt = HEBO(space, model_config={"num_epochs": 8}, pop=16, iters=8)
    lg = run_experiment(
        _quad, opt, max_evals=12, batch=4,
        save_path=str(tmp_path / "exp.csv"),
        checkpoint_path=str(tmp_path / "exp_ckpt.pkl"),
    )
    assert len(lg.rows) == 12
    assert (tmp_path / "exp.csv").exists()
    assert (tmp_path / "exp_ckpt.pkl").exists()
    assert lg.frame["Best y"].is_monotonic_decreasing


def test_run_experiment_stopping_y():
    """RDUCB BOStopper semantics: terminate when the target y is reached."""
    import numpy as np

    from hebo_tpu import DesignSpace
    from hebo_tpu.optimizers.baselines import RandomSearch
    from hebo_tpu.utils.experiment import run_experiment

    space = DesignSpace(
        [{"name": "x", "type": "num", "lb": -1.0, "ub": 1.0}]
    )

    def task(df):
        return df[["x"]].values.astype(float) ** 2

    opt = RandomSearch(space)
    logger = run_experiment(task, opt, max_evals=64, batch=4,
                            stopping_y=0.5)
    # x²≤0.5 has 70% mass per draw — stops long before the 64-eval budget
    assert len(logger.rows) < 64
    assert logger._best <= 0.5
