"""febo solver family: multi-start L-BFGS, grid solver, subdomain BO.

Parity: RDUCB/hdbo/febo/solvers/{candidate,multi_lbfgs}.py and
febo/algorithms/subdomainbo/ (VERDICT r1 missing-#7).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.acq_optimizers.solvers import (
    candidate_solver,
    grid_solver,
    multi_start_lbfgs,
)


def _quad(X):
    X = jnp.asarray(X)
    t = jnp.asarray([0.3, -0.7, 0.5], X.dtype)[: X.shape[1]]
    return jnp.sum((X - t[None, :]) ** 2, axis=1, keepdims=True)


def test_candidate_and_grid_solver():
    rng = np.random.default_rng(0)
    cands = rng.uniform(-1, 1, (256, 2))
    x, v = candidate_solver(lambda X: np.asarray(_quad(X)), cands)
    assert v <= np.asarray(_quad(cands)).min() + 1e-9
    xg, vg = grid_solver(lambda X: np.asarray(_quad(X)), [-1, -1], [1, 1], 21)
    assert vg < 0.01  # 21x21 grid lands near (0.3, -0.7)


def test_multi_start_lbfgs_reaches_optimum():
    rng = np.random.default_rng(1)
    X0 = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
    x, v = multi_start_lbfgs(_quad, X0, [-1] * 3, [1] * 3, n_iters=40)
    np.testing.assert_allclose(x, [0.3, -0.7, 0.5], atol=5e-3)
    assert v < 1e-4


def test_multi_start_lbfgs_respects_bounds():
    # optimum at 0.9 outside box [-0.5, 0.5] -> solution pinned to bound
    def f(X):
        X = jnp.asarray(X)
        return jnp.sum((X - 0.9) ** 2, axis=1, keepdims=True)

    X0 = np.zeros((4, 2), np.float32)
    x, v = multi_start_lbfgs(f, X0, [-0.5, -0.5], [0.5, 0.5], n_iters=30)
    np.testing.assert_allclose(x, [0.5, 0.5], atol=1e-3)


@pytest.mark.parametrize("mode", ["coordinate", "random", "ascent", "tr"])
def test_subdomain_bo_improves(mode):
    from hebo_tpu import DesignSpace
    from hebo_tpu.optimizers.subdomain import SubDomainBO

    space = DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": -2.0, "ub": 2.0} for i in range(3)]
    )

    def f(df):
        x = df.values.astype(float)
        return np.sum((x - 0.5) ** 2, axis=1, keepdims=True)

    opt = SubDomainBO(space, mode=mode, n_init=5,
                      model_config={"num_epochs": 20})
    for i in range(14):
        rec = opt.suggest(1)
        y = f(rec)
        if i == 3:
            y[0, 0] = np.inf  # robustness probe
        opt.observe(rec, y)
    init_best = float(np.nanmin(np.where(
        np.isfinite(opt.y[: opt.n_init, 0]), opt.y[: opt.n_init, 0], np.nan)))
    assert opt.best_y <= init_best
    assert opt.best_y < 2.0


def test_line_bo_factories():
    from hebo_tpu import DesignSpace
    from hebo_tpu.optimizers.subdomain import (
        AscentLineBO, CoordinateLineBO, RandomLineBO)

    space = DesignSpace().parse(
        [{"name": "x0", "type": "num", "lb": 0.0, "ub": 1.0},
         {"name": "x1", "type": "num", "lb": 0.0, "ub": 1.0}]
    )
    for fac in (CoordinateLineBO, RandomLineBO, AscentLineBO):
        opt = fac(space, n_init=3, model_config={"num_epochs": 6})
        for _ in range(5):
            rec = opt.suggest(1)
            opt.observe(rec, np.sum(rec.values**2, axis=1, keepdims=True))
        assert np.isfinite(opt.best_y)
