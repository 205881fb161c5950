"""Metrics logging backends + BOiLS session/task."""

import os

import numpy as np
import pytest

from hebo_tpu.utils.metrics_logging import LocalRunTracker, TensorboardLogger


def test_local_run_tracker(tmp_path):
    t = LocalRunTracker(str(tmp_path / "mlruns"), "exp1")
    rid = t.start_run()
    t.log_params({"model": "gp", "pop": 100})
    for i in range(5):
        t.log_metric("best_y", 10.0 - i, step=i)
    hist = t.get_metric_history("best_y")
    assert len(hist) == 5
    assert hist[-1]["value"] == 6.0
    art = tmp_path / "a.txt"
    art.write_text("hello")
    t.log_artifact(str(art))
    t.end_run()
    assert os.path.exists(t.run_dir + "/artifacts/a.txt")


def test_tensorboard_logger(tmp_path):
    tb = TensorboardLogger(str(tmp_path / "tb"))
    tb.log_metric("loss", 1.0, 0)
    tb.log_metric("loss", 0.5, 1)
    tb.close()
    assert any(os.scandir(str(tmp_path / "tb")))


def test_boils_session_and_task():
    from hebo_tpu.tasks.boils import BoilsTask, SynthesisSession
    from hebo_tpu.tasks.eda import random_aag

    sess = SynthesisSession(netlist_path=random_aag(seed=9))
    res = sess.run_sequences([["rw"], ["rw", "b", "dc"], []])
    assert all(r is not None for r in res)
    task = BoilsTask(session=sess, seq_len=3)
    df = task.space.sample(4, seed=0)
    y = task(df)
    assert y.shape == (4, 1)
    assert np.all(np.isfinite(y))


def test_boils_preset_on_task():
    from hebo_tpu.optimizers.bo_builder import BoBuilder
    from hebo_tpu.tasks.boils import BoilsTask

    task = BoilsTask(seq_len=4)
    opt = BoBuilder(
        "gp_ssk", "ls", "ei", "basic", model_kwargs={"num_epochs": 8}
    ).build_bo(task.space, n_init=4)
    for _ in range(3):
        rec = opt.suggest(2)
        opt.observe(rec, task(rec))
    assert np.isfinite(opt.best_y)


def test_hpob_tabular_snap_and_bo():
    from hebo_tpu import HEBO
    from hebo_tpu.tasks.hpob import SyntheticHPOBTask

    task = SyntheticHPOBTask(dim=2, n_points=128, seed=0)
    df = task.space.sample(8, seed=0)
    y = task(df)
    assert y.shape == (8, 1)
    opt = HEBO(task.space, model_config={"num_epochs": 8}, pop=16, iters=8)
    for _ in range(5):
        rec = opt.suggest(4)
        opt.observe(rec, task(rec))
    assert task.regret(np.array([opt.best_y]))[0] >= -1e-9


def test_drills_baseline_trains():
    from hebo_tpu.tasks.boils import BoilsTask
    from hebo_tpu.tasks.drills import DrillsBaseline

    task = BoilsTask(seq_len=4)
    agent = DrillsBaseline(task, seed=0)
    out = agent.train(n_episodes=4)
    assert len(out["qor_trace"]) == 4
    assert out["best_qor"] <= 2.0 + 1e-9  # never worse than doing nothing
    assert len(out["best_seq"]) == 4
    assert all(op in task.operators for op in out["best_seq"])
