"""CompBO compositional acq-opt + AIRBO uncertain-input GP tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.models import get_model

CONT = [
    {"name": "x0", "type": "num", "lb": -2, "ub": 2},
    {"name": "x1", "type": "num", "lb": -2, "ub": 2},
]


@pytest.mark.parametrize("method", ["cadam", "scgd", "ascgd", "nasa", "adam"])
def test_compositional_optimizer_improves_qei(method):
    from hebo_tpu.acquisitions.acq import AcqParams
    from hebo_tpu.acq_optimizers.compositional import CompositionalAcqOptimizer

    space = DesignSpace(CONT)
    df = space.sample(20, seed=0)
    X = space.transform(df)
    y = np.sum(X**2, axis=1, keepdims=True)
    gp = get_model("gp", space, num_epochs=20)
    gp.fit(X, y)
    opt = CompositionalAcqOptimizer(space, method=method, n_steps=32, n_starts=8)
    params = AcqParams(tau=jnp.float32(float(y.min())))
    rec = opt.optimize(gp, None, params, n_suggestions=2, seed=0)
    assert rec.shape == (2, 2)
    assert np.all(np.isfinite(rec))
    # optimized points should be near the minimum region (qEI peak)
    assert np.mean(np.sum(rec**2, axis=1)) < np.mean(np.sum(X**2, axis=1))


def test_expected_rbf_matches_rbf_at_zero_noise():
    from hebo_tpu.models.gp.kernels import rbf
    from hebo_tpu.models.gp.uncertain_gp import expected_rbf

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    ls = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    z = jnp.zeros(3, jnp.float32)
    K1 = expected_rbf(x1, x2, ls, z, z)
    K2 = rbf(x1, x2, ls)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), rtol=1e-4, atol=1e-5)


def test_expected_rbf_smooths_with_noise():
    from hebo_tpu.models.gp.uncertain_gp import expected_rbf

    x = jnp.asarray([[0.0], [1.0]], jnp.float32)
    ls = jnp.asarray([0.5], jnp.float32)
    s = jnp.asarray([0.5], jnp.float32)
    z = jnp.zeros(1, jnp.float32)
    K_noise = expected_rbf(x, x, ls, s, s)
    K_clean = expected_rbf(x, x, ls, z, z)
    # noise lowers the diagonal and flattens the kernel
    assert K_noise[0, 0] < K_clean[0, 0]
    assert K_noise[0, 1] / K_noise[0, 0] > K_clean[0, 1] / K_clean[0, 0]


def test_mmd_nystrom_kernel_properties():
    from hebo_tpu.models.gp.uncertain_gp import mmd_nystrom_kernel

    rng = np.random.default_rng(1)
    S1 = jnp.asarray(rng.standard_normal((4, 8, 2)), jnp.float32)
    S2 = S1 + 0.0
    landmarks = jnp.asarray(rng.standard_normal((16, 2)), jnp.float32)
    K = mmd_nystrom_kernel(S1, S2, landmarks, gamma=1.0, feat_ls=1.0)
    assert K.shape == (4, 4)
    # identical distributions → diagonal = 1 (MMD = 0)
    np.testing.assert_allclose(np.asarray(jnp.diag(K)), 1.0, atol=1e-3)
    assert np.all(np.asarray(K) <= 1.0 + 1e-5)


def test_uncertain_gp_fit_predict():
    space = DesignSpace(CONT)
    df = space.sample(24, seed=2)
    X = space.transform(df)
    y = np.sin(2 * X[:, :1].astype(float))
    m = get_model("uncertain_gp", space, num_epochs=30, input_std=0.05)
    m.fit(X, y)
    mu, var = m.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    assert np.sqrt(np.mean((mu - y) ** 2)) < np.std(y)
