"""GBDT surrogate (reference CatBoost parity, catboost.py:18-62)."""

import numpy as np
import pytest

from hebo_tpu.design_space import DesignSpace
from hebo_tpu.models import get_model
from hebo_tpu.optimizers.bo import BO


def _space(d=2):
    return DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": -2.0, "ub": 2.0} for i in range(d)]
    )


def test_gbdt_fits_smooth_function():
    space = _space()
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (80, 2)).astype(np.float32)
    y = ((X[:, 0] - 0.5) ** 2 + (X[:, 1] + 0.3) ** 2).reshape(-1, 1)
    m = get_model("gbdt", space, num_epochs=60).fit(X, y)
    g = rng.uniform(-2, 2, (40, 2)).astype(np.float32)
    yg = ((g[:, 0] - 0.5) ** 2 + (g[:, 1] + 0.3) ** 2)
    mu, var = m.predict(g)
    assert np.corrcoef(mu[:, 0], yg)[0, 1] > 0.7
    assert np.all(var > 0)


def test_gbdt_min_iterations_guard():
    # reference: iterations >= 2 * num_ensembles (catboost.py:29-30)
    m = get_model("catboost", _space(), num_epochs=5, num_ensembles=10)
    assert m.n_rounds == 20


def test_gbdt_uncertainty_grows_away_from_data():
    space = _space(1)
    rng = np.random.default_rng(1)
    # train only on the left half of the box
    X = rng.uniform(-2, 0, (60, 1)).astype(np.float32)
    y = np.sin(2 * X)
    m = get_model("gbdt", space, num_epochs=60).fit(X, y)
    _, var_in = m.predict(np.asarray([[-1.0]], np.float32))
    _, var_out = m.predict(np.asarray([[1.9]], np.float32))
    assert float(var_out) > float(var_in)


def test_gbdt_nan_rows_filtered():
    space = _space()
    rng = np.random.default_rng(2)
    X = rng.uniform(-2, 2, (30, 2)).astype(np.float32)
    y = np.sum(X, axis=1, keepdims=True)
    y[3, 0] = np.inf
    y[7, 0] = np.nan
    m = get_model("gbdt", space, num_epochs=25).fit(X, y)
    mu, var = m.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(var))


def test_gbdt_pure_state_matches_predict():
    import jax.numpy as jnp

    space = _space()
    rng = np.random.default_rng(3)
    X = rng.uniform(-2, 2, (40, 2)).astype(np.float32)
    y = np.sum(X**2, axis=1, keepdims=True)
    m = get_model("gbdt", space, num_epochs=25).fit(X, y)
    q = rng.uniform(-2, 2, (8, 2)).astype(np.float32)
    mu_np, var_np = m.predict(q)
    mu_j, var_j = m.predict_pure(m.state, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(mu_j), mu_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_j), var_np, rtol=1e-4, atol=1e-5)


def test_bo_loop_with_gbdt_improves():
    space = _space()
    f = lambda df: ((df["x0"].values - 0.5) ** 2 + (df["x1"].values + 0.3) ** 2).reshape(-1, 1)
    opt = BO(space, model_name="catboost", model_config={"num_epochs": 40})
    ys = []
    for _ in range(24):
        rec = opt.suggest(1)
        y = f(rec)
        opt.observe(rec, y)
        ys.append(float(y[0, 0]))
    assert min(ys) < min(ys[:5])
