"""Decomposition structure learning (RDUCB learnDependencyStructure parity).

Reference behavior: RDUCB/hdbo/function_optimizer.py:630-712 — Gibbs-style
group reassignment scored by additive-GP data log-likelihood, group-size
capped, best-likelihood hypothesis adopted.
"""

import jax
import numpy as np
import pytest

from hebo_tpu.design_space import DesignSpace
from hebo_tpu.models import get_model
from hebo_tpu.models.gp.gp import _make_data
from hebo_tpu.models.gp.structure import (
    assignment_mll,
    assignment_to_cliques,
    dim_log_kernels,
    learn_assignment,
)


def _additive_data(n=100, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    # ground truth: pairs (0,1) and (2,3)
    y = (np.sin(4 * X[:, 0] * X[:, 1]) + (X[:, 2] - X[:, 3]) ** 2).reshape(-1, 1)
    return X, y.astype(np.float32)


def test_learner_recovers_additive_pairs():
    X, y = _additive_data()
    data = _make_data(X, y, tuple(range(4)), 128)
    z, mll = learn_assignment(
        jax.random.PRNGKey(0), data.X, data.y, data.mask, data.x_lb,
        data.x_span, numeric_dims=tuple(range(4)), cat_dims=(),
        M=4, max_group_size=2, n_sweeps=4,
    )
    cliques = set(assignment_to_cliques(np.asarray(z), 4))
    assert cliques == {(0, 1), (2, 3)}
    assert np.isfinite(float(mll))


def test_learned_beats_wrong_assignment():
    X, y = _additive_data()
    data = _make_data(X, y, tuple(range(4)), 128)
    Ld = dim_log_kernels(data.X, data.x_lb, data.x_span, tuple(range(4)), ())
    good = assignment_mll(np.array([0, 0, 1, 1]), Ld, data.y, data.mask, 4)
    bad = assignment_mll(np.array([0, 1, 0, 1]), Ld, data.y, data.mask, 4)
    assert float(good) > float(bad)


def test_group_size_constraint_respected():
    X, y = _additive_data(n=60, seed=1)
    data = _make_data(X, y, tuple(range(4)), 64)
    z, _ = learn_assignment(
        jax.random.PRNGKey(3), data.X, data.y, data.mask, data.x_lb,
        data.x_span, numeric_dims=tuple(range(4)), cat_dims=(),
        M=4, max_group_size=1, n_sweeps=2,
    )
    sizes = np.bincount(np.asarray(z), minlength=4)
    assert sizes.max() <= 1


def test_rdgp_learn_decomposition_fit_predict():
    space = DesignSpace().parse(
        [{"name": f"x{i}", "type": "num", "lb": 0.0, "ub": 1.0} for i in range(4)]
    )
    X, y = _additive_data(n=60, seed=2)
    m = get_model("gp_rd", space, decomposition="learn", num_epochs=10)
    m.fit(X, y)
    assert len(m.cliques) >= 1
    assert all(len(c) <= 3 for c in m.cliques)
    mu, var = m.predict(X[:8])
    assert mu.shape == (8, 1) and var.shape == (8, 1)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    # resample marks stale; next fit relearns without error
    m.resample_decomposition()
    m.fit(X, y)
    assert len(m.cliques) >= 1
