"""Extended ensembles: MCBN, Gumbel gates, conditional inputs."""

import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.models import get_model

SPACE = [{"name": f"x{i}", "type": "num", "lb": -1, "ub": 1} for i in range(5)]


def _data(n=32, seed=0):
    space = DesignSpace(SPACE)
    X = space.transform(space.sample(n, seed=seed))
    y = (X[:, 0] ** 2 + 0.5 * X[:, 1]).reshape(-1, 1)
    return space, X, y


@pytest.mark.parametrize("name", ["mcbn", "gumbel", "conditional_deep_ensemble"])
def test_ext_ensemble_contract(name):
    space, X, y = _data()
    m = get_model(name, space, num_epochs=25, num_ensembles=3, num_hiddens=16)
    m.fit(X, y)
    mu, var = m.predict(X)
    assert mu.shape == (len(X), 1)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    assert np.sqrt(np.mean((mu - y) ** 2)) < np.std(y)


def test_gumbel_importance_shape():
    space, X, y = _data()
    m = get_model("gumbel", space, num_epochs=20, num_ensembles=2, num_hiddens=16)
    m.fit(X, y)
    imp = m.feature_importance()
    assert imp.shape == (5,)
    assert np.all((imp >= 0) & (imp <= 1))


def test_conditional_masking():
    space, X, y = _data()

    def active(Xo):
        # dim 2 inactive when x0 < 0 (a conditional-param toy rule)
        m = np.ones_like(Xo, dtype=bool)
        m[:, 2] = Xo[:, 0] >= 0
        return m

    m = get_model(
        "conditional_deep_ensemble", space,
        active_fn=active, num_epochs=20, num_ensembles=2, num_hiddens=16,
    )
    m.fit(X, y)
    mu, var = m.predict(X)
    assert np.all(np.isfinite(mu))
