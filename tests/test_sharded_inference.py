"""Cross-device MCMC/SMC: sharded samplers vs single-device within MC error.

The north-star distributed-inference axis (BASELINE.json; SURVEY.md §2.9
P2): HMC chains sharded with shard_map + psum R-hat; SMC particles sharded
with psum weight normalization and all_gather systematic resampling.
Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hebo_tpu.models.gp.inference import (
    hmc_sample,
    hmc_sample_sharded,
    smc_sample,
    smc_sample_sharded,
)

SIG = np.array([[0.5, 0.6 * np.sqrt(1.0)], [0.6 * np.sqrt(1.0), 2.0]])
PREC = np.linalg.inv(SIG)
MU = np.array([1.0, -2.0])


def _logp(q):
    d = q["x"] - jnp.asarray(MU, jnp.float32)
    return -0.5 * d @ jnp.asarray(PREC, jnp.float32) @ d


def _log_prior(q):
    return -0.5 * jnp.sum((q["x"] / 3.0) ** 2)


def _log_lik(q):
    return _logp(q) - _log_prior(q)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return Mesh(np.array(devs[:8]), ("shard",))


def test_hmc_sharded_moments_and_rhat(mesh8):
    k = jax.random.PRNGKey(0)
    q0 = {"x": jax.random.normal(k, (16, 2))}
    s, acc, rhat = hmc_sample_sharded(
        _logp, q0, k, mesh8, axis="shard",
        n_chains=16, n_warmup=128, n_samples=64, n_leapfrog=12,
    )
    xs = np.asarray(s["x"]).reshape(-1, 2)
    assert s["x"].shape == (64, 16, 2)
    np.testing.assert_allclose(xs.mean(0), MU, atol=0.3)
    np.testing.assert_allclose(xs.var(0), np.diag(SIG), rtol=0.5)
    assert float(rhat) < 1.2
    assert 0.5 < float(np.asarray(acc).mean()) <= 1.0


def test_hmc_sharded_matches_vmapped_stats(mesh8):
    """1-device (vmap) and 8-device (shard_map) runs are statistically
    equivalent: same per-chain keys -> compare pooled moments."""
    k = jax.random.PRNGKey(3)
    q0 = {"x": jax.random.normal(k, (8, 2))}
    kw = dict(n_warmup=96, n_samples=48, n_leapfrog=10)
    s1, _ = hmc_sample(_logp, q0, k, n_chains=8, **kw)
    s8, _, _ = hmc_sample_sharded(_logp, q0, k, mesh8, axis="shard", n_chains=8, **kw)
    x1 = np.asarray(s1["x"]).reshape(-1, 2)
    x8 = np.asarray(s8["x"]).reshape(-1, 2)
    # identical chain kernel + identical keys -> identical draws (up to
    # cross-backend reduction order); check tight agreement of moments
    np.testing.assert_allclose(x1.mean(0), x8.mean(0), atol=0.05)
    np.testing.assert_allclose(x1.var(0), x8.var(0), rtol=0.1)


def test_smc_sharded_matches_single_device(mesh8):
    kp = jax.random.PRNGKey(1)
    parts0 = {"x": 3.0 * jax.random.normal(kp, (256, 2))}
    kw = dict(n_stages=32, n_mala=4, mala_step=0.15)
    p8, z8 = smc_sample_sharded(
        _log_prior, _log_lik, parts0, kp, mesh8, axis="shard", **kw
    )
    p1, z1 = smc_sample(_log_prior, _log_lik, parts0, kp, **kw)
    x8 = np.asarray(p8["x"])
    x1 = np.asarray(p1["x"])
    assert x8.shape == (256, 2)
    # sharded vs single-device: same posterior within MC error
    np.testing.assert_allclose(x8.mean(0), x1.mean(0), atol=0.25)
    np.testing.assert_allclose(z8, z1, atol=0.3)
    # and both near the target
    np.testing.assert_allclose(x8.mean(0), MU, atol=0.45)
    # analytic evidence: Z = ((2pi)^{d/2}|SIG|^{1/2}) / (2pi*9)  (the prior
    # in log_prior is unnormalized; particles are drawn from N(0, 9 I))
    la = (np.log(2 * np.pi) + 0.5 * np.log(np.linalg.det(SIG))
          - np.log(2 * np.pi * 9.0))
    assert abs(float(z8) - la) < 0.7


def test_smc_sharded_resampling_collapses_weights(mesh8):
    """A sharp likelihood forces ESS collapse -> the all_gather systematic
    resampling path must run and concentrate particles."""
    def sharp_lik(q):
        return -50.0 * jnp.sum((q["x"] - 1.0) ** 2)

    kp = jax.random.PRNGKey(7)
    parts0 = {"x": 3.0 * jax.random.normal(kp, (128, 2))}
    p8, _ = smc_sample_sharded(
        _log_prior, sharp_lik, parts0, kp, mesh8, axis="shard",
        n_stages=24, n_mala=4, mala_step=0.02,
    )
    x8 = np.asarray(p8["x"])
    np.testing.assert_allclose(x8.mean(0), [1.0, 1.0], atol=0.3)
    assert x8.std(0).max() < 0.8  # concentrated posterior
