"""On-device NSGA-II / GA acquisition-optimizer tests.

Mirrors reference HEBO/test/test_evolution_optimizer.py: single- and
multi-objective optimization on analytic acquisitions, fix_input
(contextual) support, discrete snapping."""

import jax.numpy as jnp
import numpy as np

from hebo_tpu import DesignSpace
from hebo_tpu.acquisitions import AcqParams, Acquisition
from hebo_tpu.acq_optimizers import EvolutionOpt


class Sphere(Acquisition):
    num_obj = 1

    def eval_pure(self, model, state, params, X):
        return jnp.sum(X * X, axis=1, keepdims=True)


class TwoObj(Acquisition):
    """Classic bi-objective: f1 = x², f2 = (x-2)²  (Pareto set x ∈ [0, 2])."""

    num_obj = 2

    def eval_pure(self, model, state, params, X):
        x = X[:, :1]
        return jnp.concatenate([x**2, (x - 2.0) ** 2], axis=1)


CONT = [
    {"name": "x0", "type": "num", "lb": -5, "ub": 5},
    {"name": "x1", "type": "num", "lb": -5, "ub": 5},
]


def test_ga_minimizes_sphere():
    space = DesignSpace(CONT)
    opt = EvolutionOpt(space, Sphere(), pop=32, iters=40)
    best = opt.optimize(seed=0)
    assert best.shape == (1, 2)
    assert float(np.sum(best**2)) < 0.3


def test_nsga2_pareto_spread():
    space = DesignSpace([{"name": "x0", "type": "num", "lb": -5, "ub": 5}])
    opt = EvolutionOpt(space, TwoObj(), pop=48, iters=40)
    pop, F = opt.optimize(seed=0, return_pop=True)
    # most of the population should be inside the Pareto set [0, 2]
    inside = np.mean((pop[:, 0] > -0.3) & (pop[:, 0] < 2.3))
    assert inside > 0.8
    assert F.shape == (48, 2)


def test_mixed_space_discrete_snap():
    space = DesignSpace(
        CONT
        + [
            {"name": "i", "type": "int", "lb": 0, "ub": 10},
            {"name": "c", "type": "cat", "categories": ["a", "b", "c", "d"]},
        ]
    )

    class MixedSphere(Acquisition):
        num_obj = 1

        def eval_pure(self, model, state, params, X):
            # prefers i == 3 and c == 'b' (code 1)
            return (
                jnp.sum(X[:, :2] ** 2, axis=1, keepdims=True)
                + (X[:, 2:3] - 3.0) ** 2
                + (X[:, 3:4] - 1.0) ** 2
            )

    opt = EvolutionOpt(space, MixedSphere(), pop=48, iters=40)
    best = opt.optimize(seed=0)
    assert best[0, 2] == 3.0
    assert best[0, 3] == 1.0
    assert np.allclose(best[0, 2:], np.round(best[0, 2:]))


def test_fix_input_respected():
    space = DesignSpace(CONT)
    opt = EvolutionOpt(space, Sphere(), pop=32, iters=20)
    pop, F = opt.optimize(seed=0, return_pop=True, fix_input={"x0": 1.5})
    assert np.allclose(pop[:, 0], 1.5, atol=1e-5)


def test_initial_suggest_injected():
    space = DesignSpace(CONT)
    opt = EvolutionOpt(space, Sphere(), pop=16, iters=0)
    init = np.asarray([[0.25, -0.25]])
    pop, F = opt.optimize(seed=0, return_pop=True, initial_suggest=init)
    assert any(np.allclose(row, [0.25, -0.25], atol=1e-5) for row in pop)
