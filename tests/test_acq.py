"""Acquisition contract tests vs scipy closed forms.

Mirrors reference HEBO/test/test_acq.py (shape/finiteness contracts) plus
closed-form EI/PI/LCB checks (SURVEY.md §4 implication 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm as snorm

from hebo_tpu.acquisitions import (
    EI,
    LCB,
    MACE,
    PI,
    AcqParams,
    GeneralAcq,
    Mean,
    MOMeanSigmaLCB,
    Sigma,
    log_ei,
    log_pi,
)


class FakeModel:
    """Deterministic surrogate: mu = x0, var = softplus(x1)."""

    def predict_pure(self, state, X):
        mu = X[:, :1]
        var = jnp.log1p(jnp.exp(X[:, 1:2])) + 1e-3
        return mu, var

    @property
    def state(self):
        return None


@pytest.fixture
def mx():
    model = FakeModel()
    X = jnp.asarray(
        np.random.default_rng(0).standard_normal((20, 2)), jnp.float32
    )
    return model, X


def test_lcb_formula(mx):
    model, X = mx
    params = AcqParams(kappa=jnp.float32(1.7))
    out = np.asarray(LCB().eval_pure(model, None, params, X))
    mu, var = model.predict_pure(None, X)
    expect = np.asarray(mu) - 1.7 * np.sqrt(np.asarray(var))
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_ei_matches_scipy(mx):
    model, X = mx
    tau = 0.3
    params = AcqParams(tau=jnp.float32(tau), eps=jnp.float32(0.0))
    out = np.asarray(EI().eval_pure(model, None, params, X))[:, 0]
    mu = np.asarray(X[:, 0], dtype=np.float64)
    sigma = np.sqrt(np.log1p(np.exp(np.asarray(X[:, 1], np.float64))) + 1e-3)
    z = (tau - mu) / sigma
    ei = sigma * (z * snorm.cdf(z) + snorm.pdf(z))
    np.testing.assert_allclose(np.exp(-out), ei, rtol=2e-3, atol=1e-6)


def test_pi_matches_scipy(mx):
    model, X = mx
    tau = -0.2
    params = AcqParams(tau=jnp.float32(tau), eps=jnp.float32(0.0))
    out = np.asarray(PI().eval_pure(model, None, params, X))[:, 0]
    mu = np.asarray(X[:, 0], dtype=np.float64)
    sigma = np.sqrt(np.log1p(np.exp(np.asarray(X[:, 1], np.float64))) + 1e-3)
    pi = snorm.cdf((tau - mu) / sigma)
    np.testing.assert_allclose(np.exp(-out), pi, rtol=2e-3, atol=1e-6)


def test_log_ei_asymptotic_finite():
    z = jnp.asarray([-4.0, -6.0, -10.0, -30.0, -100.0], jnp.float32)
    out = np.asarray(log_ei(z, jnp.zeros_like(z)))
    assert np.all(np.isfinite(out))
    # monotone decreasing in |z|
    assert np.all(np.diff(out) < 0)


def test_log_ei_continuity_at_switch():
    # direct and asymptotic branches should roughly agree near z = -6
    za = jnp.asarray([-5.999], jnp.float32)
    zb = jnp.asarray([-6.001], jnp.float32)
    a = float(log_ei(za, jnp.zeros(1))[0])
    b = float(log_ei(zb, jnp.zeros(1))[0])
    assert abs(a - b) < 0.3


def test_log_pi_stable():
    z = jnp.asarray([-50.0], jnp.float32)
    assert np.isfinite(float(log_pi(z)[0]))


def test_mace_shape_and_finiteness(mx):
    model, X = mx
    params = AcqParams(
        tau=jnp.float32(0.0),
        kappa=jnp.float32(2.0),
        key=jax.random.PRNGKey(0),
        noise=jnp.float32(0.01),
    )
    out = np.asarray(MACE().eval_pure(model, None, params, X))
    assert out.shape == (20, 3)
    assert np.all(np.isfinite(out))


def test_mo_mean_sigma_lcb(mx):
    model, X = mx
    params = AcqParams(tau=jnp.float32(0.5), kappa=jnp.float32(2.0))
    acq = MOMeanSigmaLCB()
    out = np.asarray(acq.eval_pure(model, None, params, X))
    assert out.shape == (20, acq.num_obj + acq.num_constr)


class FakeMOModel:
    def predict_pure(self, state, X):
        mu = jnp.stack([X[:, 0], X[:, 1], X[:, 0] + X[:, 1]], axis=1)
        var = jnp.ones_like(mu) * 0.1
        return mu, var


def test_general_acq():
    model = FakeMOModel()
    X = jnp.asarray(np.random.default_rng(1).standard_normal((10, 2)), jnp.float32)
    acq = GeneralAcq(num_obj=2, num_constr=1)
    out = np.asarray(acq.eval_pure(model, None, AcqParams(), X))
    assert out.shape == (10, 3)


def test_mean_sigma(mx):
    model, X = mx
    m = np.asarray(Mean().eval_pure(model, None, AcqParams(), X))
    s = np.asarray(Sigma().eval_pure(model, None, AcqParams(), X))
    assert np.all(s <= 0)
    np.testing.assert_allclose(m[:, 0], np.asarray(X[:, 0]), rtol=1e-5)
