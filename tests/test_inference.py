"""Posterior-inference tests: HMC / SVI / SMC on analytic targets + GP.

The standard-Gaussian recovery tests give tight statistical checks; the
GP-level tests are contract tests (shapes, finiteness, calibration
sanity) in the reference's smoke-test spirit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.models.gp.inference import hmc_sample, smc_sample, svi_fit


def _gauss_logp(mu, sigma):
    def logp(p):
        return -0.5 * jnp.sum((p["x"] - mu) ** 2) / sigma**2

    return logp


def test_hmc_recovers_gaussian():
    logp = _gauss_logp(1.5, 0.7)
    key = jax.random.PRNGKey(0)
    chains = 8
    init = {"x": jax.random.normal(key, (chains, 3))}
    samples, acc = hmc_sample(
        logp, init, key, n_chains=chains, n_warmup=200, n_samples=150,
        n_leapfrog=8, init_step=0.2,
    )
    xs = np.asarray(samples["x"]).reshape(-1, 3)
    assert float(np.mean(acc)) > 0.5
    assert abs(xs.mean() - 1.5) < 0.12
    assert abs(xs.std() - 0.7) < 0.12


def test_svi_recovers_gaussian():
    logp = _gauss_logp(-0.8, 0.5)
    key = jax.random.PRNGKey(1)
    init = {"x": jnp.zeros(2)}
    samples, elbo = svi_fit(logp, init, key, n_steps=400, n_samples=400, lr=0.05)
    xs = np.asarray(samples["x"])
    assert abs(xs.mean() - (-0.8)) < 0.15
    assert abs(xs.std() - 0.5) < 0.15
    assert np.isfinite(float(elbo))


def test_smc_recovers_gaussian():
    key = jax.random.PRNGKey(2)
    n = 256

    def log_prior(p):
        return -0.5 * jnp.sum(p["x"] ** 2) / 3.0**2

    def log_lik(p):
        return -0.5 * jnp.sum((p["x"] - 1.0) ** 2) / 0.5**2

    init = {"x": 3.0 * jax.random.normal(key, (n, 2))}
    parts, logZ = smc_sample(log_prior, log_lik, init, key, n_stages=24, n_mala=3, mala_step=0.05)
    xs = np.asarray(parts["x"])
    # posterior: precision 1/9 + 1/.25 → mean ≈ 0.973, std ≈ 0.494
    assert abs(xs.mean() - 0.973) < 0.2
    assert np.isfinite(float(logZ))


@pytest.mark.parametrize("inference", ["hmc", "svi", "smc"])
def test_gp_with_posterior_inference(inference):
    from hebo_tpu import DesignSpace
    from hebo_tpu.models import get_model

    space = DesignSpace(
        [
            {"name": "x0", "type": "num", "lb": -1, "ub": 1},
            {"name": "x1", "type": "num", "lb": -1, "ub": 1},
        ]
    )
    df = space.sample(20, seed=0)
    X = space.transform(df)
    y = np.sin(3 * X[:, :1].astype(float)) + 0.5 * X[:, 1:].astype(float)
    gp = get_model(
        "gp", space, num_out=1,
        num_epochs=20, inference=inference, n_ensemble=4,
        n_chains=2, n_warmup=16, n_particles=16,
    )
    gp.fit(X, y)
    mu, var = gp.predict(X)
    assert mu.shape == (20, 1) and np.all(np.isfinite(mu))
    assert np.all(var > 0)
    # ensemble samples must differ (a real posterior, not copies)
    ls = np.asarray(gp.samples.log_ls)
    assert ls.shape[0] == 4
    assert np.ptp(ls) > 1e-5
