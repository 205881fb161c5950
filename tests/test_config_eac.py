"""Config tree + EAC ensemble tests."""

import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.config import OptimizerConfig, from_dict, from_string, from_yaml
from hebo_tpu.models import get_model

CATSEQ = [{"name": f"c{i}", "type": "cat", "categories": list("abcd")} for i in range(5)]
CONT = [{"name": "x0", "type": "num", "lb": -2, "ub": 2}]


def test_config_from_string_builder():
    cfg = from_string("gp_to__rs__ei__basic", model_kwargs={"num_epochs": 8})
    assert cfg.optimizer == "bo_builder"
    space = DesignSpace(CATSEQ)
    opt = cfg.build(space)
    rec = opt.suggest(2)
    assert len(rec) == 2


def test_config_simple_and_roundtrip():
    cfg = from_string("hebo", model_kwargs={"num_epochs": 8},
                      opt_kwargs={"pop": 16, "iters": 8})
    d = cfg.to_dict()
    cfg2 = from_dict(d)
    space = DesignSpace(CONT)
    opt = cfg2.build(space)
    rec = opt.suggest(2)
    assert len(rec) == 2


def test_config_yaml(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(
        "optimizer: bo_builder\n"
        "model_id: gp_o\n"
        "acq_opt_id: rs\n"
        "acq_func_id: lcb\n"
        "tr_id: none\n"
        "n_init: 4\n"
        "model_kwargs:\n"
        "  num_epochs: 8\n"
    )
    cfg = from_yaml(str(p))
    assert cfg.model_id == "gp_o"
    assert cfg.model_kwargs == {"num_epochs": 8}
    space = DesignSpace(CATSEQ)
    opt = cfg.build(space)
    assert opt.n_init == 4


@pytest.mark.parametrize("cell", ["mlp", "rnn", "transformer"])
def test_eac_ensemble(cell):
    space = DesignSpace(CATSEQ)
    df = space.sample(32, seed=0)
    X = space.transform(df)
    y = (np.sum(X == 0, axis=1, keepdims=True)).astype(float)
    m = get_model("eac", space, cell=cell, num_epochs=60,
                  num_ensembles=2, num_hiddens=16)
    m.fit(X, y)
    mu, var = m.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    assert np.sqrt(np.mean((mu - y) ** 2)) < np.std(y)
    draws = m.sample_f(2)(X[:4])
    assert draws.shape == (2, 4, 1)
