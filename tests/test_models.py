"""Registry cross-product model tests (reference test_base_model.py style):
every registered model fit/predict on cont-only / cat-only / mixed data."""

import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.models import MODEL_REGISTRY, get_model

CONT = [
    {"name": "x0", "type": "num", "lb": -1, "ub": 1},
    {"name": "x1", "type": "num", "lb": -1, "ub": 1},
]
MIXED = CONT + [{"name": "c", "type": "cat", "categories": ["a", "b", "c"]}]
CATONLY = [
    {"name": "c0", "type": "cat", "categories": ["a", "b", "c"]},
    {"name": "c1", "type": "cat", "categories": ["x", "y"]},
]

FAST_CONF = {
    "gp": {"num_epochs": 15},
    "gpy_wgp": {"num_epochs": 15, "n_restarts": 2},
    "svgp": {"num_epochs": 30, "num_inducing": 8},
    "deep_ensemble": {"num_epochs": 30, "num_ensembles": 3, "num_hiddens": 16},
    "rf": {"n_estimators": 20},
    "gbdt": {"num_epochs": 30, "depth": 3},
}


def _check(model, X, y):
    mu, var = model.predict(X)
    assert mu.shape == (len(X), 1)
    assert var.shape == (len(X), 1)
    assert np.all(np.isfinite(mu))
    assert np.all(var > 0)
    assert np.sqrt(np.mean((mu - y) ** 2)) < 1.5 * (np.std(y) + 1e-6)


@pytest.mark.parametrize("name", sorted(FAST_CONF))
@pytest.mark.parametrize("spec", [CONT, MIXED, CATONLY], ids=["cont", "mixed", "cat"])
def test_model_cross_product(name, spec):
    space = DesignSpace(spec)
    df = space.sample(24, seed=0)
    X = space.transform(df)
    rng = np.random.default_rng(0)
    y = (np.sum(X.astype(float), axis=1, keepdims=True)
         + 0.05 * rng.standard_normal((24, 1)))
    model = get_model(name, space, num_out=1, **FAST_CONF[name])
    model.fit(X, y)
    _check(model, X, y)


def test_registry_contains_expected():
    for name in ["gp", "gpy_wgp", "svgp", "deep_ensemble", "rf"]:
        assert name in MODEL_REGISTRY


def test_deep_ensemble_thompson():
    space = DesignSpace(CONT)
    df = space.sample(20, seed=1)
    X = space.transform(df)
    y = np.sum(X**2, axis=1, keepdims=True)
    m = get_model("deep_ensemble", space, num_epochs=20, num_ensembles=4)
    m.fit(X, y)
    f = m.sample_f(n_samples=2)
    draws = f(X[:5])
    assert draws.shape == (2, 5, 1)


def test_warped_gp_monotone_warp_helps():
    """Warped GP should fit a sharply non-stationary function at least as
    well as shapes allow (smoke: finite, reasonable)."""
    space = DesignSpace([{"name": "x0", "type": "num", "lb": 0, "ub": 1}])
    df = space.sample(30, seed=2)
    X = space.transform(df)
    y = np.exp(5 * X.astype(float)) / 100.0
    m = get_model("gpy_wgp", space, num_epochs=40)
    m.fit(X, y)
    mu, var = m.predict(X)
    assert np.sqrt(np.mean((mu - y) ** 2)) < np.std(y)
