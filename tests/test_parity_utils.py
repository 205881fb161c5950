"""Slice sampler, DepRound, runtime estimator, Kriging-believer batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu import DesignSpace


def test_slice_sampler_recovers_gaussian():
    from hebo_tpu.models.gp.inference import slice_sample

    def logp(p):
        return -0.5 * jnp.sum((p["x"] - 2.0) ** 2) / 0.6**2

    samples = slice_sample(
        logp, {"x": jnp.zeros(2)}, jax.random.PRNGKey(0),
        n_samples=60, n_burnin=30, thinning=2, width=1.0,
    )
    xs = np.asarray(samples["x"])
    assert xs.shape == (60, 2)
    assert abs(xs.mean() - 2.0) < 0.3
    assert abs(xs.std() - 0.6) < 0.3


def test_dep_round_marginals():
    from hebo_tpu.utils.sampling import dep_round

    rng = np.random.default_rng(0)
    p = np.array([0.2, 0.8, 0.5, 0.5])  # sums to 2
    draws = np.stack([dep_round(p, rng) for _ in range(4000)])
    assert np.all(draws.sum(axis=1) == 2)
    np.testing.assert_allclose(draws.mean(axis=0), p, atol=0.04)


def test_runtime_estimator():
    from hebo_tpu.utils.runtime_estimator import RuntimeEstimator

    est = RuntimeEstimator()
    for n in range(1, 11):
        est.record(0.1 + 0.02 * n)
    rem = est.estimate_remaining(5)
    true_rem = sum(0.1 + 0.02 * n for n in range(11, 16))
    assert abs(rem - true_rem) < 0.1
    assert not est.is_stalled(0.4)
    assert est.is_stalled(30.0)


def test_kriging_believer_batch_distinct():
    from hebo_tpu.optimizers.bo_builder import BoBuilder

    space = DesignSpace([
        {"name": "x0", "type": "num", "lb": -2, "ub": 2},
        {"name": "c", "type": "cat", "categories": ["a", "b", "c"]},
    ])

    def f(df):
        return (df["x0"].values.astype(float) ** 2
                - (df["c"].values == "b")).reshape(-1, 1)

    opt = BoBuilder(
        "gp_to", "rs", "ei", "none", model_kwargs={"num_epochs": 8}
    ).build_bo(space, n_init=4, batch_strategy="kb")
    for _ in range(3):
        rec = opt.suggest(3)
        assert len(rec) == 3
        opt.observe(rec, f(rec))
    assert np.isfinite(opt.best_y)
