"""Tests: ML-tuning tasks (SVM/XGB), NAS-Bench tabular, lpsolve-MPS adapter,
sigmoid param, and feature-warp kernels.

Mirrors the reference's task-test style (MCBO/tests/tasks — real black
boxes, tiny budgets) with hermetic synthetic instances.
"""

import numpy as np
import pandas as pd
import pytest

from hebo_tpu.design_space import DesignSpace
from hebo_tpu.tasks import LPSolveTask, NASBenchTask, SVMTuningTask, XGBTuningTask
from hebo_tpu.tasks.highdim import parse_mps


@pytest.mark.parametrize("task_cls", [SVMTuningTask, XGBTuningTask])
def test_ml_tuning_task_evaluates(task_cls):
    # generous wall-clock guard: the default 60 s can legitimately fire
    # (→ inf, by design) when the host is contended by a concurrent run,
    # which is a property of the machine, not of the task
    task = task_cls()
    task.eval_timeout_s = 600.0
    df = task.space.sample(3)
    y = task(df)
    assert y.shape == (3, 1)
    assert np.isfinite(y).all()


def test_ml_tuning_inside_bo_loop():
    from hebo_tpu import HEBO

    task = SVMTuningTask()
    opt = HEBO(task.space, rand_sample=4)
    for _ in range(2):
        rec = opt.suggest(2)
        opt.observe(rec, task(rec))
    assert np.isfinite(opt.best_y)


def test_nasbench_task_deterministic():
    t1, t2 = NASBenchTask(seed=3), NASBenchTask(seed=3)
    df = t1.space.sample(5)
    assert np.allclose(t1(df), t2(df))
    assert t1(df).shape == (5, 1)


def test_lpsolve_synthetic_and_penalty():
    task = LPSolveTask(n_bin=6, n_cont=3, seed=0)
    df = task.space.sample(4)
    y = task(df)
    assert y.shape == (4, 1) and np.isfinite(y).all()


def test_parse_mps_roundtrip():
    mps = """NAME t
ROWS
 N  COST
 G  C1
 E  C2
COLUMNS
    a         COST      1.0   C1        2.0
    a         C2        1.0
    b         COST     -1.0   C1        1.0
RHS
    RHS       C1        2.0   C2        0.5
BOUNDS
 UP BND       b         3.0
ENDATA
"""
    p = parse_mps(mps)
    assert p["names"] == ["a", "b"]
    assert np.allclose(p["c"], [1.0, -1.0])
    # G row becomes negated <= row
    assert np.allclose(p["A_ub"], [[-2.0, -1.0]])
    assert np.allclose(p["b_ub"], [-2.0])
    assert np.allclose(p["A_eq"], [[1.0, 0.0]])
    assert p["bounds"][1] == (0.0, 3.0)


def test_sigmoid_param_roundtrip():
    space = DesignSpace().parse(
        [{"name": "p", "type": "sigmoid", "lb": 0.05, "ub": 0.95}]
    )
    df = space.sample(16)
    assert ((df["p"] >= 0.05) & (df["p"] <= 0.95)).all()
    t = space.transform(df)
    back = space.inverse_transform(t)
    assert np.allclose(back["p"].values.astype(float),
                       df["p"].values.astype(float), atol=1e-9)
    # logit bounds are symmetric for a symmetric box
    lo, hi = space.opt_lb[0], space.opt_ub[0]
    assert np.isclose(lo, -hi)


def test_feature_warp_kernels():
    import jax.numpy as jnp

    from hebo_tpu.models.gp.kernels import feature_warp_cosine, feature_warp_rbf

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((12, 5)).astype("float32"))
    idx = jnp.arange(6)
    k_rbf = feature_warp_rbf(idx, idx, table, jnp.ones(5))
    k_cos = feature_warp_cosine(idx, idx, table)
    assert k_rbf.shape == (6, 6) and k_cos.shape == (6, 6)
    assert np.allclose(np.diag(np.asarray(k_rbf)), 1.0, atol=1e-5)
    assert np.allclose(np.diag(np.asarray(k_cos)), 1.0, atol=1e-5)
    # PSD-ish: symmetric, eigvals >= -tol
    for k in (k_rbf, k_cos):
        k = np.asarray(k, float)
        assert np.allclose(k, k.T, atol=1e-5)
        assert np.linalg.eigvalsh(k).min() > -1e-4


def test_macebo_bayesmark_protocol():
    from hebo_tpu.optimizers import MACEBO

    api_config = {
        "lr": {"type": "real", "space": "log", "range": (1e-4, 1e-1)},
        "depth": {"type": "int", "space": "linear", "range": (1, 8)},
        "use_bias": {"type": "bool"},
        "activation": {"type": "cat", "values": ["relu", "tanh"]},
    }
    opt = MACEBO(api_config, rand_sample=4)
    for _ in range(2):
        guesses = opt.suggest(2)
        assert len(guesses) == 2
        for g in guesses:
            assert set(g) == set(api_config)
            assert isinstance(g["depth"], int) and 1 <= g["depth"] <= 8
            assert isinstance(g["use_bias"], bool)
            assert g["activation"] in ("relu", "tanh")
            assert 1e-4 <= g["lr"] <= 1e-1
        losses = [float(g["lr"] * g["depth"]) for g in guesses]
        opt.observe(guesses, losses)
    assert np.isfinite(opt.best_y)


def test_antbo_tools():
    import tempfile

    from hebo_tpu.tasks import AbsolutTool, ManualTool, TableFillingTool

    tool = AbsolutTool(seq_len=5, seed=0)
    seqs = ["ACDEF", "ACDEG", "ACDEF"]
    y = tool(seqs)
    assert y.shape == (3, 1)
    assert y[0, 0] == y[2, 0]  # deterministic
    assert y[0, 0] != y[1, 0]

    tf = TableFillingTool({"ACDEF": -7.0}, fill_value=1.0)
    assert np.allclose(tf(["ACDEF", "XXXXX"]).ravel(), [-7.0, 1.0])

    with tempfile.TemporaryDirectory() as d:
        mt = ManualTool(d)
        mt.request(["AAA", "BBB"])
        with open(f"{d}/scores.txt", "w") as f:
            f.write("1.5\n-2.5\n")
        assert np.allclose(mt.collect(2).ravel(), [1.5, -2.5])


def test_bo_experiments_resume(tmp_path):
    from hebo_tpu.tasks import Branin
    from hebo_tpu.utils.experiment import BOExperiments

    task = Branin()
    cfg = {"name": "hebo", "kwargs": {"rand_sample": 4}}
    exp = BOExperiments(cfg, task, save_dir=str(tmp_path))
    exp.run(max_evals=8, batch=4)
    exp2 = BOExperiments(cfg, task, save_dir=str(tmp_path))
    log2 = exp2.run(max_evals=12, batch=4, resume=True)
    # resumed run only does the remaining 4 evals
    assert len(log2.rows) == 4


def test_gp_slice_sampled_ensemble():
    """COMBO-style slice-sampled hyperparameter ensemble (combo_gp parity)."""
    import jax.numpy as jnp

    from hebo_tpu.design_space import DesignSpace
    from hebo_tpu.models import get_model

    space = DesignSpace().parse([
        {"name": "x", "type": "num", "lb": 0.0, "ub": 1.0},
        {"name": "c", "type": "cat", "categories": ["a", "b", "c"]},
    ])
    rng = np.random.default_rng(0)
    df = space.sample(24)
    y = (df["x"].values.astype(float) - 0.4) ** 2 + rng.normal(0, 0.01, 24)
    model = get_model("gp", space, num_out=1, optimizer="slice",
                      n_ensemble=4, num_epochs=10, cat_kernel="diffusion")
    X = space.transform(df)
    model.fit(X, y.reshape(-1, 1))
    mu, var = model.predict(X[:8])
    assert mu.shape == (8, 1) and var.shape == (8, 1)
    assert np.isfinite(np.asarray(mu)).all()
    assert (np.asarray(var) > 0).all()


def test_mab_baseline_improves():
    from hebo_tpu.optimizers import MultiArmedBandit
    from hebo_tpu.tasks import PestControlTask

    task = PestControlTask(n_stations=5)
    opt = MultiArmedBandit(task.space)
    bests = []
    for _ in range(10):
        rec = opt.suggest(4)
        opt.observe(rec, task(rec))
        bests.append(float(opt.best_y))
    assert bests[-1] <= bests[0]
    assert np.isfinite(bests[-1])


def test_rotated_synthetic_variant():
    from hebo_tpu.tasks import Ackley

    t_rot = Ackley(dim=4, rotate=True)
    t_pln = Ackley(dim=4)
    df = t_pln.space.sample(6)
    y_rot, y_pln = t_rot(df), t_pln(df)
    assert np.isfinite(y_rot).all()
    assert (y_rot != y_pln).any()
    # rotation preserves determinism
    assert np.allclose(t_rot(df), Ackley(dim=4, rotate=True)(df))
