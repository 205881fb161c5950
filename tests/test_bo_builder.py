"""BoBuilder preset integration tests — the mix-and-match promise.

Mirrors MCBO tests/optimizers/test_bo_builder.py:36-60: build EVERY preset
on a small mixed task and run a few iterations."""

import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.optimizers.bo_builder import BO_ALGOS, BoBuilder

MIXED = [
    {"name": "x0", "type": "num", "lb": -2, "ub": 2},
    {"name": "c0", "type": "cat", "categories": ["a", "b", "c"]},
    {"name": "c1", "type": "cat", "categories": ["p", "q", "r", "s"]},
]
CATONLY = [
    {"name": f"c{i}", "type": "cat", "categories": ["a", "b", "c"]}
    for i in range(5)
]


def _obj_mixed(df):
    x = df["x0"].values.astype(float)
    b = (df["c0"].values == "b").astype(float)
    q = (df["c1"].values == "q").astype(float)
    return (x**2 - b - 0.5 * q).reshape(-1, 1)


def _obj_cat(df):
    codes = np.stack([(df[f"c{i}"].values == "a") for i in range(5)])
    return -codes.sum(axis=0).astype(float).reshape(-1, 1)


FAST = {
    "model_kwargs": {"num_epochs": 10},
}


@pytest.mark.parametrize("name", sorted(BO_ALGOS))
def test_preset_runs(name):
    builder = BO_ALGOS[name]
    import dataclasses

    builder = dataclasses.replace(builder, model_kwargs={"num_epochs": 10})
    spec = CATONLY if name in ("COMBO", "BOCS", "BOSS", "BOiLS") else MIXED
    obj = _obj_cat if spec is CATONLY else _obj_mixed
    space = DesignSpace(spec)
    opt = builder.build_bo(space, n_init=6)
    for _ in range(5):
        rec = opt.suggest(2)
        assert len(rec) == 2
        opt.observe(rec, obj(rec))
    assert np.isfinite(opt.best_y)


def test_custom_combination():
    space = DesignSpace(MIXED)
    opt = BoBuilder(
        "gp_o", "rs", "lcb", "none", model_kwargs={"num_epochs": 8}
    ).build_bo(space, n_init=4)
    for _ in range(4):
        rec = opt.suggest(2)
        opt.observe(rec, _obj_mixed(rec))
    assert opt.num_obs == 8


def test_casmopolitan_tr_dynamics():
    space = DesignSpace(MIXED)
    import dataclasses

    b = dataclasses.replace(
        BO_ALGOS["Casmopolitan"],
        model_kwargs={"num_epochs": 8},
        tr_kwargs={"succ_tol": 1, "fail_tol": 2},
    )
    opt = b.build_bo(space, n_init=4)
    for _ in range(6):
        rec = opt.suggest(2)
        opt.observe(rec, _obj_mixed(rec))
    tr = opt.tr_manager
    assert tr.center is not None
    assert tr.radius > 0
