"""GP contract tests: posterior vs closed form, fit sanity, robustness.

Mirrors the reference's test style (HEBO/test/test_gp.py,
test_base_model.py): shape/finiteness contracts on cont-only / cat-only /
mixed data, plus what the reference lacks — an analytic-posterior check on
a tiny dataset with fixed hyperparameters (SURVEY.md §4 implication 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.models import get_model
from hebo_tpu.models.gp.gp import GPCore, GPData, GPParams

CONT_SPEC = [
    {"name": "x0", "type": "num", "lb": -1, "ub": 1},
    {"name": "x1", "type": "num", "lb": -1, "ub": 1},
]
MIXED_SPEC = CONT_SPEC + [{"name": "c", "type": "cat", "categories": ["a", "b", "c"]}]
CAT_SPEC = [
    {"name": "c0", "type": "cat", "categories": ["a", "b", "c"]},
    {"name": "c1", "type": "cat", "categories": ["x", "y"]},
]


def _fit_gp(spec, n=24, seed=0, **conf):
    space = DesignSpace(spec)
    df = space.sample(n, seed=seed)
    X = space.transform(df)
    y = np.sum(np.sin(X[:, : min(2, X.shape[1])].astype(float)), axis=1, keepdims=True)
    conf.setdefault("num_epochs", 30)
    gp = get_model("gp", space, num_out=1, **conf)
    gp.fit(X, y)
    return space, gp, X, y


@pytest.mark.parametrize("spec", [CONT_SPEC, MIXED_SPEC, CAT_SPEC])
def test_fit_predict_contract(spec):
    space, gp, X, y = _fit_gp(spec)
    mu, var = gp.predict(X)
    assert mu.shape == (len(X), 1) and var.shape == (len(X), 1)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    # in-sample fit should beat predicting the mean
    assert np.sqrt(np.mean((mu - y) ** 2)) < np.std(y)


def test_predict_interpolates():
    space, gp, X, y = _fit_gp(CONT_SPEC, n=32, num_epochs=60)
    mu, var = gp.predict(X)
    assert np.sqrt(np.mean((mu - y) ** 2)) < 0.2 * np.std(y)


def test_nan_rows_filtered():
    space = DesignSpace(CONT_SPEC)
    df = space.sample(20, seed=1)
    X = space.transform(df)
    y = np.sum(X, axis=1, keepdims=True)
    y[3, 0] = np.inf
    y[7, 0] = np.nan
    gp = get_model("gp", space, num_out=1, num_epochs=10)
    gp.fit(X, y)
    mu, var = gp.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(var))


def test_sample_y_shape():
    space, gp, X, y = _fit_gp(CONT_SPEC, n=16)
    s = gp.sample_y(X[:5], n_samples=7)
    assert s.shape == (7, 5, 1)


def test_sample_f_thompson():
    space, gp, X, y = _fit_gp(CONT_SPEC, n=16)
    f = gp.sample_f(n_samples=3, seed=0)
    draws = f(X[:6])
    assert draws.shape == (3, 6, 1)
    assert np.all(np.isfinite(draws))


def test_posterior_matches_closed_form():
    """Fixed hyperparameters, 3 training points → compare with the
    textbook GP posterior computed in numpy float64."""
    core = GPCore(numeric_dims=(0,), cat_dims=(), num_categories=(), kernel="rbf")
    n_pad = 8
    Xtr = np.array([[-1.0], [0.0], [1.0]], np.float32)
    ytr = np.array([[0.5], [-0.2], [0.3]], np.float32)
    Xp = np.zeros((n_pad, 1), np.float32)
    yp = np.zeros((n_pad, 1), np.float32)
    Xp[:3], yp[:3] = Xtr, ytr
    mask = np.zeros(n_pad, bool)
    mask[:3] = True
    data = GPData(
        X=jnp.asarray(Xp), y=jnp.asarray(yp), mask=jnp.asarray(mask),
        x_lb=jnp.asarray([-1.0], jnp.float32), x_span=jnp.asarray([2.0], jnp.float32),
        y_mean=jnp.float32(0.0), y_std=jnp.float32(1.0),
    )
    ls, sc, noise = 0.7, 1.3, 0.05
    params = GPParams(
        log_ls=jnp.asarray([np.log(ls)], jnp.float32),
        log_sc=jnp.asarray(np.log(sc), jnp.float32),
        log_noise=jnp.asarray(np.log(noise), jnp.float32),
        mean=jnp.asarray(0.0, jnp.float32),
        emb=jnp.zeros((0, 0), jnp.float32),
        log_wa=jnp.zeros((1,), jnp.float32),
        log_wb=jnp.zeros((1,), jnp.float32),
    )
    cache = core.posterior_cache(params, data)
    Xq = np.array([[-0.5], [0.25], [0.9]], np.float32)
    mu, var = core.predict_scaled(params, cache, data, jnp.asarray(Xq))

    # numpy closed form on the SCALED feature frame ([-1,1] minmax)
    def feats(x):
        return -1.0 + 2.0 * (x - (-1.0)) / 2.0

    def k(a, b):
        d2 = (feats(a)[:, None, 0] - feats(b)[None, :, 0]) ** 2 / ls**2
        return sc * np.exp(-0.5 * d2)

    K = k(Xtr, Xtr) + (noise + core.noise_lb) * np.eye(3)
    Ks = k(Xtr, Xq)
    Kss = sc * np.ones(len(Xq))
    Kinv = np.linalg.inv(K.astype(np.float64))
    mu_ref = Ks.T @ Kinv @ ytr.astype(np.float64)
    var_ref = Kss - np.sum(Ks * (Kinv @ Ks), axis=0)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(var)[:, 0], var_ref, rtol=1e-3, atol=1e-3)


def test_nll_decreases_with_fit():
    space = DesignSpace(CONT_SPEC)
    df = space.sample(20, seed=2)
    X = space.transform(df)
    y = np.sin(3 * X[:, :1].astype(float))
    gp = get_model("gp", space, num_out=1, num_epochs=50, optimizer="adam")
    gp.fit(X, y)
    core, data = gp.core, gp.data
    p0 = core.init_params(jax.random.PRNGKey(0), data)
    nll0 = float(core.nll(p0, data))
    nll1 = float(core.nll(gp.params, data))
    assert nll1 < nll0


def test_multi_task_wrapper():
    space = DesignSpace(CONT_SPEC)
    df = space.sample(16, seed=3)
    X = space.transform(df)
    y = np.hstack([np.sum(X, axis=1, keepdims=True), np.sum(X**2, axis=1, keepdims=True)])
    m = get_model("multi_task", space, num_out=2, num_epochs=10)
    m.fit(X, y)
    mu, var = m.predict(X)
    assert mu.shape == (16, 2) and var.shape == (16, 2)
    assert np.all(np.isfinite(mu))


def test_heteroscedastic_noise_learns_structure():
    """Noise grows with |x0|: the het GP should learn larger predictive
    noise in the noisy region than the quiet one."""
    space = DesignSpace([{"name": "x0", "type": "num", "lb": -1, "ub": 1}])
    rng = np.random.default_rng(0)
    df = space.sample(96, seed=0)
    X = space.transform(df)
    noise_sd = 0.02 + 0.5 * (X[:, 0] > 0)
    y = np.sin(2 * X[:, :1]) + (noise_sd * rng.standard_normal(96))[:, None]
    gp = get_model("gp", space, num_epochs=120, heteroscedastic=True,
                   optimizer="adam")
    gp.fit(X, y)
    core, data, p = gp.core, gp.data, gp.params
    nv = np.asarray(core.noise_diag(p, data.X, data))[np.asarray(data.mask)]
    Xv = np.asarray(data.X)[np.asarray(data.mask)]
    noisy = nv[Xv[:, 0] > 0.5 * (Xv[:, 0].max())].mean()
    quiet = nv[Xv[:, 0] < 0.5 * (Xv[:, 0].min())].mean()
    assert noisy > 2.0 * quiet
