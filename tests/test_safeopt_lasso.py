"""SafeOpt optimizer (febo safeopt parity, RDUCB/hdbo/febo) and
LassoBench-style task (RDUCB datasets.py) + MLP-kernel GP (gpy_mlp)."""

import numpy as np
import pandas as pd
import pytest

from hebo_tpu.design_space import DesignSpace
from hebo_tpu.models import get_model
from hebo_tpu.optimizers import SafeOpt
from hebo_tpu.tasks import LassoBenchTask


def _space2():
    return DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": -2.0, "ub": 2.0} for i in range(2)]
    )


def _f(df):
    return (df["x0"].values ** 2 + df["x1"].values ** 2).reshape(-1, 1)


def test_safeopt_requires_safe_seed():
    opt = SafeOpt(_space2(), safety_threshold=4.0)
    with pytest.raises(RuntimeError):
        opt.suggest(1)
    # unsafe seed also rejected
    df = pd.DataFrame({"x0": [2.0], "x1": [2.0]})
    opt.observe(df, _f(df))
    with pytest.raises(RuntimeError):
        opt.suggest(1)


def test_safeopt_stays_safe_and_improves():
    space = _space2()
    # 30 pSGLD epochs: the 15-epoch fit is under-converged enough that
    # the probabilistic beta=2.5 bound admits one excursion on some RNG
    # streams (the r4 batched-restart fit legitimately changed the
    # stream); the assertion stays strict
    opt = SafeOpt(space, safety_threshold=4.0, beta=2.5, seed=0,
                  model_config={"num_epochs": 30})
    seed_df = pd.DataFrame({"x0": [1.0], "x1": [1.0]})
    opt.observe(seed_df, _f(seed_df))
    ys, viol = [], 0
    for _ in range(10):
        rec = opt.suggest(1)
        y = _f(rec)
        opt.observe(rec, y)
        ys.append(float(y[0, 0]))
        viol += int(y[0, 0] > 4.0)
    assert viol == 0
    assert min(ys) <= 2.0  # moved toward the optimum from the seed
    inc_df, inc_y = opt.safe_incumbent
    assert inc_y <= 4.0


def test_safeopt_batch_suggest():
    space = _space2()
    opt = SafeOpt(space, safety_threshold=4.0, model_config={"num_epochs": 10})
    seed_df = pd.DataFrame({"x0": [1.0], "x1": [0.5]})
    opt.observe(seed_df, _f(seed_df))
    opt.observe(*(lambda d: (d, _f(d)))(pd.DataFrame({"x0": [0.8], "x1": [0.6]})))
    rec = opt.suggest(3)
    assert len(rec) == 3


def test_lasso_task_shapes_and_range():
    t = LassoBenchTask("synt_simple")
    assert t.dim == 60 and t.space.num_cols == 60
    df = t.space.sample(4, seed=0)
    y = t(df)
    assert y.shape == (4, 1)
    assert np.all(np.isfinite(y)) and np.all(y >= 0)


def test_lasso_weights_matter():
    t = LassoBenchTask("synt_simple")
    # extreme penalties (theta=+1 everywhere) kill all coefficients → worse
    hi = pd.DataFrame({f"w{j}": [1.0] for j in range(t.dim)})
    zero = pd.DataFrame({f"w{j}": [0.0] for j in range(t.dim)})
    assert float(t(hi)) > float(t(zero))


def test_mlp_kernel_gp_fit():
    space = _space2()
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (30, 2)).astype(np.float32)
    y = np.sum(X**2, axis=1, keepdims=True)
    m = get_model("gpy_mlp", space, num_epochs=20).fit(X, y)
    mu, var = m.predict(X[:8])
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    assert np.sqrt(np.mean((mu - y[:8]) ** 2)) < np.std(y)
