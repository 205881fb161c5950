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


# --------------------------------------- conditional transformed overlap
def test_conditional_transformed_overlap_semantics():
    """Manual check of the per-dim rules (MCBO kernels.py:410-560):
    mismatch -> 0; match w/o hyperparams -> 1; match w/ hyperparams ->
    hyp-kernel gram value."""
    import jax.numpy as jnp

    from hebo_tpu.models.gp.kernels import conditional_transformed_overlap

    # 2 seq dims, categories {0: group0, 1: no-hyp, 2: group1}
    c1 = jnp.asarray([[0, 1], [2, 2]], jnp.float32)
    c2 = jnp.asarray([[0, 1], [1, 2]], jnp.float32)
    g0 = jnp.asarray([[0.5, 0.2], [0.3, 0.9]], jnp.float32)
    g1 = jnp.asarray([[0.8, 0.6], [0.4, 0.7]], jnp.float32)
    grams = jnp.stack([g0, g1])
    cat2g = jnp.asarray([0, -1, 1], jnp.int32)
    lam = jnp.asarray([1.0, 1.0], jnp.float32)
    K = np.asarray(conditional_transformed_overlap(c1, c2, grams, cat2g, lam))
    # x1[0] vs x2[0]: dims (0==0 cat0 -> g0[0,0]=0.5), (1==1 no-hyp -> 1)
    want00 = np.exp((0.5 + 1.0) / 2.0 - 1.0)
    # x1[0] vs x2[1]: (0 vs 1 mismatch -> 0), (1 vs 2 mismatch -> 0)
    want01 = np.exp(0.0 - 1.0)
    # x1[1] vs x2[1]: (2 vs 1 mismatch -> 0), (2==2 cat2 -> g1[1,1]=0.7)
    want11 = np.exp((0.0 + 0.7) / 2.0 - 1.0)
    np.testing.assert_allclose(K[0, 0], want00, rtol=1e-5)
    np.testing.assert_allclose(K[0, 1], want01, rtol=1e-5)
    np.testing.assert_allclose(K[1, 1], want11, rtol=1e-5)
    # self-similarity normalized to 1 (diag convention of this module)
    Kd = np.asarray(conditional_transformed_overlap(c1, c1, jnp.stack(
        [jnp.ones((2, 2)), jnp.ones((2, 2))]), cat2g, lam))
    np.testing.assert_allclose(np.diag(Kd), 1.0, rtol=1e-5)


def test_gp_conditional_to_fits_hierarchical_space():
    """GP with cat_kernel=conditional_to on a hierarchical space: two
    sequence dims choosing among 3 ops, where op 0 is tuned by x0 and op 2
    by (x1, x2); op 1 has no hyperparameters."""
    from hebo_tpu.design_space import DesignSpace
    from hebo_tpu.models import get_model

    space = DesignSpace().parse([
        {"name": "x0", "type": "num", "lb": -1.0, "ub": 1.0},
        {"name": "x1", "type": "num", "lb": -1.0, "ub": 1.0},
        {"name": "x2", "type": "num", "lb": -1.0, "ub": 1.0},
        {"name": "op_a", "type": "cat", "categories": ["p", "q", "r"]},
        {"name": "op_b", "type": "cat", "categories": ["p", "q", "r"]},
    ])
    rng = np.random.default_rng(0)
    n = 40
    X = np.column_stack([
        rng.uniform(-1, 1, (n, 3)),
        rng.integers(0, 3, (n, 2)).astype(float),
    ]).astype(np.float32)
    y = (
        np.sin(2 * X[:, 0]) * (X[:, 3] == 0)
        + (X[:, 1] * X[:, 2]) * (X[:, 3] == 2)
        + 0.3 * (X[:, 4] == 1)
    ).reshape(-1, 1).astype(np.float32)
    m = get_model(
        "gp", space, num_out=1, num_epochs=20, n_restarts=1,
        cat_kernel="conditional_to",
        cond_groups=((0,), (1, 2)),          # positions into numeric dims
        cond_cat_to_group=(0, -1, 1),        # p->group0, q->none, r->group1
    )
    m.fit(X, y)
    mu, var = m.predict(X[:10])
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    # in-sample fit should beat the mean predictor
    resid = np.mean((mu[:, 0] - y[:10, 0]) ** 2)
    base = np.var(y[:10, 0])
    assert resid < base, (resid, base)
