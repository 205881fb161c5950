"""DKL GP, monotone layers, plotting utils, SFU task suite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.models import get_model
from hebo_tpu.tasks.synthetic import _TASKS, get_task


def test_dkl_gp_fits_nonstationary():
    space = DesignSpace([
        {"name": "x0", "type": "num", "lb": -1, "ub": 1},
        {"name": "x1", "type": "num", "lb": -1, "ub": 1},
    ])
    df = space.sample(40, seed=0)
    X = space.transform(df)
    y = np.sign(X[:, :1]) * X[:, :1] ** 2 + 0.3 * X[:, 1:]
    m = get_model("dkl", space, num_epochs=80, feat_dim=4)
    m.fit(X, y)
    mu, var = m.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    assert np.sqrt(np.mean((mu - y) ** 2)) < np.std(y)


def test_lattice_monotone():
    from hebo_tpu.models.nn.mono_layers import Lattice1D

    lat = Lattice1D.init(jax.random.PRNGKey(0), 8)
    lat = lat._replace(deltas=jax.random.normal(jax.random.PRNGKey(1), (8,)))
    x = jnp.linspace(0, 1, 50)[:, None]
    y = np.asarray(lat(x))[:, 0]
    assert np.all(np.diff(y) >= -1e-6)


def test_monotone_mlp():
    from hebo_tpu.models.nn.mono_layers import MonotoneMLP

    net = MonotoneMLP.init(
        jax.random.PRNGKey(0), d_in=2, mono_mask=[1.0, 0.0], hidden=8
    )
    x_free = jnp.zeros((50, 1))
    xs = jnp.linspace(-1, 1, 50)[:, None]
    y = np.asarray(net(jnp.concatenate([xs, x_free], axis=1)))[:, 0]
    assert np.all(np.diff(y) >= -1e-5)  # monotone in the flagged input


def test_plotting_utils(tmp_path):
    from hebo_tpu.utils.plotting import aggregate_curves, best_so_far, plot_convergence

    y = np.array([3.0, np.inf, 1.0, 2.0])
    np.testing.assert_array_equal(best_so_far(y), [3.0, 3.0, 1.0, 1.0])
    runs = [np.random.default_rng(i).random(20) for i in range(3)]
    mean, err = aggregate_curves(runs)
    assert mean.shape == (20,) and np.all(np.diff(mean) <= 1e-12)
    agg = plot_convergence(
        {"m": runs}, save_path=str(tmp_path / "c.png")
    )
    assert "m" in agg


@pytest.mark.parametrize("name", sorted(_TASKS))
def test_sfu_tasks_evaluate(name):
    task = get_task(name)
    df = task.space.sample(8, seed=0)
    y = task(df)
    assert y.shape == (8, 1)
    assert np.all(np.isfinite(y))
    # minimum claim sanity: best random value ≥ published fmin (loose)
    assert y.min() >= float(task.fmin) - 1e-6
