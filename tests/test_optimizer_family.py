"""Cross-product smoke tests over the optimizer family (reference
test_optimizer.py style): every optimizer runs a few iterations on a tiny
space, finite/shape contracts, with robustness to an inf observation."""

import numpy as np
import pytest

from hebo_tpu import DesignSpace
from hebo_tpu.optimizers import (
    BO,
    CMAES,
    Evolution,
    GeneralBO,
    HEBO,
    HEBO_Embedding,
    HEBO_VectorContextual,
    NoMR_BO,
    NoisyOpt,
    parse_space_from_bayesmark,
)
from hebo_tpu.sklearn_tuner import sklearn_tuner

CONT = [
    {"name": "x0", "type": "num", "lb": -3, "ub": 3},
    {"name": "x1", "type": "num", "lb": -3, "ub": 3},
]


def _quad(df):
    x = df[["x0", "x1"]].values.astype(float)
    return np.sum(x**2, axis=1, keepdims=True)


@pytest.mark.parametrize(
    "cls,kw",
    [
        (BO, {"model_config": {"num_epochs": 10}, "pop": 16, "iters": 8}),
        (HEBO, {"model_config": {"num_epochs": 10}, "pop": 16, "iters": 8}),
        (NoisyOpt, {"model_config": {"num_epochs": 10}, "pop": 16, "iters": 8}),
        (NoMR_BO, {"model_config": {"num_epochs": 10}, "pop": 16, "iters": 8}),
        (CMAES, {}),
        (Evolution, {"pop": 16}),
    ],
)
def test_optimizer_smoke(cls, kw):
    space = DesignSpace(CONT)
    opt = cls(space, **kw)
    for it in range(6):
        rec = opt.suggest(4)
        assert len(rec) == 4
        y = _quad(rec)
        if it == 2:
            y[0, 0] = np.inf
        opt.observe(rec, y)
    assert np.isfinite(opt.best_y)


def test_cmaes_converges_quadratic():
    space = DesignSpace(CONT)
    opt = CMAES(space, lam=16)
    for _ in range(30):
        rec = opt.suggest()
        opt.observe(rec, _quad(rec))
    assert opt.best_y < 0.05


def test_evolution_minimizes():
    space = DesignSpace(CONT)
    opt = Evolution(space, pop=32)
    for _ in range(15):
        rec = opt.suggest()
        opt.observe(rec, _quad(rec))
    assert opt.best_y < 0.5


def test_general_bo_multi_objective():
    space = DesignSpace([{"name": "x0", "type": "num", "lb": -2, "ub": 4}])

    def mo(df):
        x = df["x0"].values.astype(float)
        return np.stack([x**2, (x - 2.0) ** 2], axis=1)

    opt = GeneralBO(
        space, num_obj=2, model_config={"num_epochs": 8}, pop=16, iters=8
    )
    for _ in range(6):
        rec = opt.suggest(2)
        opt.observe(rec, mo(rec))
    Xpf, Ypf = opt.get_pf()
    assert len(Ypf) >= 1
    # pareto points should be in/near [0, 2]
    assert np.all(Xpf["x0"].values > -1.0) and np.all(Xpf["x0"].values < 3.0)


def test_general_bo_constrained():
    space = DesignSpace(CONT)

    def obj_con(df):
        x = df[["x0", "x1"]].values.astype(float)
        f = np.sum(x**2, axis=1, keepdims=True)
        c = (1.0 - x[:, :1])  # feasible iff x0 >= 1 → c <= 0
        return np.hstack([f, c])

    opt = GeneralBO(
        space, num_obj=1, num_constr=1,
        model_config={"num_epochs": 8}, pop=16, iters=8,
    )
    for _ in range(6):
        rec = opt.suggest(2)
        opt.observe(rec, obj_con(rec))
    assert opt.num_obs == 12


def test_contextual():
    space = DesignSpace(CONT)
    opt = HEBO_VectorContextual(
        space, context_params=["x1"],
        model_config={"num_epochs": 8}, pop=16, iters=8,
    )
    for i in range(5):
        ctx = {"x1": float(i % 2)}
        rec = opt.suggest(2, context=ctx)
        assert np.allclose(rec["x1"].values.astype(float), ctx["x1"])
        opt.observe(rec, _quad(rec))


def test_embedding_bo():
    D = 20
    space = DesignSpace(
        [{"name": f"x{i}", "type": "num", "lb": -1, "ub": 1} for i in range(D)]
    )

    def f(df):
        x = df[[f"x{i}" for i in range(D)]].values.astype(float)
        return np.sum(x[:, :3] ** 2, axis=1, keepdims=True)  # 3 active dims

    opt = HEBO_Embedding(
        space, eff_dim=4, strategy="hesbo",
        model_config={"num_epochs": 8}, pop=16, iters=8,
    )
    for _ in range(6):
        rec = opt.suggest(3)
        assert rec.shape == (3, D)
        opt.observe(rec, f(rec))
    assert np.isfinite(opt.best_y)


def test_bayesmark_adapter():
    api = {
        "lr": {"type": "real", "space": "log", "range": (1e-4, 1.0)},
        "depth": {"type": "int", "space": "linear", "range": (1, 10)},
        "boost": {"type": "bool"},
        "kind": {"type": "cat", "values": ["a", "b"]},
    }
    space = parse_space_from_bayesmark(api)
    assert space.num_params == 4
    df = space.sample(8, seed=0)
    assert df["lr"].between(1e-4, 1.0).all()


def test_sklearn_tuner_smoke():
    from sklearn.tree import DecisionTreeRegressor

    rng = np.random.default_rng(0)
    X = rng.standard_normal((60, 3))
    y = X[:, 0] * 2 + rng.standard_normal(60) * 0.1
    conf = [
        {"name": "max_depth", "type": "int", "lb": 1, "ub": 6},
        {"name": "min_samples_leaf", "type": "int", "lb": 1, "ub": 8},
    ]

    def r2(yt, yp):
        ss = np.sum((yt - yp) ** 2)
        return 1 - ss / np.sum((yt - yt.mean()) ** 2)

    best = sklearn_tuner(
        DecisionTreeRegressor, conf, X, y, metric=r2,
        max_iter=3, batch=2, n_splits=3,
        hebo_kw={"model_config": {"num_epochs": 8}, "pop": 16, "iters": 8},
    )
    assert 1 <= best["max_depth"] <= 6


@pytest.mark.parametrize("cls", ["RandomSearch", "HillClimbing", "SimulatedAnnealing", "LineBO"])
def test_baseline_optimizers(cls):
    import hebo_tpu.optimizers as O

    space = DesignSpace(CONT)
    kw = {"model_config": {"num_epochs": 8}} if cls == "LineBO" else {}
    opt = getattr(O, cls)(space, **kw)
    for _ in range(6):
        rec = opt.suggest(3)
        opt.observe(rec, _quad(rec))
    assert np.isfinite(opt.best_y)
    assert opt.best_y <= float(np.min(opt.y[:3]))
