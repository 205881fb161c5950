"""Large-N CG posterior: contract vs dense + op-level checks (SURVEY §5.7).

The solver switch is shape-static: buckets above ``max_cholesky_size`` use
pivoted-Cholesky-preconditioned block CG (ops/cg.py) instead of the dense
factorization, and the fit subsamples hyperparameter inference (reference
cap parity: MCBO exact_gp.py max_training_dataset_size).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hebo_tpu.ops.cg import pcg_solve, pivoted_cholesky, woodbury_precond_apply


def _spd(n, seed=0, cond=100.0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 8))
    K = np.exp(-0.5 * ((X[:, None] - X[None, :]) ** 2).sum(-1) / 4.0)
    return jnp.asarray(K + 0.05 * np.eye(n), jnp.float32)


def test_pivoted_cholesky_approximates():
    K = _spd(128)
    errs = []
    for r in (16, 64, 127):
        P = pivoted_cholesky(K, r)
        errs.append(float(jnp.linalg.norm(K - P @ P.T) / jnp.linalg.norm(K)))
    # monotone improvement and near-exact at full rank (the 0.05*I noise
    # keeps low ranks from being exact — it is not low-rank)
    assert errs[0] > errs[1] > errs[2]
    assert errs[1] < 0.15 and errs[2] < 0.01, errs


def test_pcg_matches_direct_solve():
    K = _spd(200, seed=1)
    rng = np.random.default_rng(2)
    B = jnp.asarray(rng.standard_normal((200, 5)), jnp.float32)
    P = pivoted_cholesky(K, 48)
    apply = woodbury_precond_apply(P, jnp.float32(0.05))
    X, res = pcg_solve(lambda V: K @ V, B, precond_apply=apply, n_iters=80)
    Xd = jnp.linalg.solve(K, B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xd), rtol=2e-2, atol=2e-3)
    assert float(res.max()) < 1e-3


def test_pcg_preconditioner_accelerates():
    K = _spd(256, seed=3)
    B = jnp.asarray(np.random.default_rng(4).standard_normal((256, 1)), jnp.float32)
    _, res_plain = pcg_solve(lambda V: K @ V, B, n_iters=16)
    P = pivoted_cholesky(K, 64)
    apply = woodbury_precond_apply(P, jnp.float32(0.05))
    _, res_pre = pcg_solve(lambda V: K @ V, B, precond_apply=apply, n_iters=16)
    assert float(res_pre[0]) < float(res_plain[0])


def test_gp_cg_posterior_matches_dense():
    """Same data, same seed: GP with CG forced (max_cholesky_size=128) vs
    dense — posterior moments agree within CG tolerance at N=512."""
    from hebo_tpu.design_space import DesignSpace
    from hebo_tpu.models import get_model

    space = DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": -3.0, "ub": 3.0} for i in range(4)]
    )
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, (512, 4)).astype(np.float32)
    y = (np.sin(X[:, :1]) + 0.1 * X[:, 1:2] ** 2).astype(np.float32)
    Xq = rng.uniform(-3, 3, (32, 4)).astype(np.float32)

    kw = dict(num_epochs=15, n_restarts=1, seed=7)
    dense = get_model("gp", space, num_out=1, **kw)
    dense.fit(X, y)
    # same fitted hyperparameters, swap the solve path only: copy the
    # fitted state into a CG-configured model
    cg = get_model("gp", space, num_out=1, max_cholesky_size=128,
                   cg_rank=96, cg_iters=128, **kw)
    cg.data = dense.data
    cg.samples = dense.samples
    cg.params = dense.params
    # rebuild caches through the CG path
    rebuilt = jax.vmap(
        lambda p: cg.core.posterior_cache(p, cg.data)
    )(dense.samples)
    cg.caches = rebuilt
    mu_d, v_d = dense.predict(Xq)
    mu_c, v_c = cg.predict(Xq)
    np.testing.assert_allclose(mu_c, mu_d, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(v_c, v_d, rtol=5e-2, atol=2e-2)


def test_gp_large_n_fit_predict_runs():
    """End-to-end: N=3000 (> default 2048 dense cap) fits via the subsample
    + CG route and predicts finitely."""
    from hebo_tpu.design_space import DesignSpace
    from hebo_tpu.models import get_model

    space = DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": -3.0, "ub": 3.0} for i in range(3)]
    )
    rng = np.random.default_rng(1)
    X = rng.uniform(-3, 3, (3000, 3)).astype(np.float32)
    y = (np.sum(np.sin(X), axis=1, keepdims=True)).astype(np.float32)
    m = get_model("gp", space, num_out=1, num_epochs=8, n_restarts=1,
                  max_cholesky_size=1024, cg_rank=64, cg_iters=64)
    m.fit(X, y)
    mu, var = m.predict(X[:64])
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    # the posterior actually uses all the data: near-training predictions
    # should correlate strongly with the targets
    cc = np.corrcoef(mu[:, 0], y[:64, 0])[0, 1]
    assert cc > 0.9, cc
