"""Native-component tests: evaluation pool, AIG optimizer, EDA task BO."""

import os
import subprocess

import numpy as np
import pytest

from hebo_tpu.native import aig_opt_path, ensure_built, run_commands
from hebo_tpu.tasks.eda import EDASeqOptTask, random_aag


def test_build_and_version():
    ensure_built()
    assert os.path.exists(aig_opt_path())


def test_eval_pool_order_and_codes():
    out = run_commands(
        [f"echo line{i}" for i in range(8)] + ["exit 7"], n_threads=4
    )
    assert len(out) == 9
    for i in range(8):
        assert out[i] == (0, f"line{i}\n")
    assert out[8][0] == 7


def test_aig_opt_reduces_size():
    p = random_aag(n_inputs=6, n_ands=48, seed=3)
    raw = subprocess.run(
        [aig_opt_path(), p], capture_output=True, text=True
    ).stdout
    opt = subprocess.run(
        [aig_opt_path(), p, "rw;b;dc"], capture_output=True, text=True
    ).stdout

    def size(s):
        return int(s.split("size=")[1].split()[0])

    assert size(opt) <= size(raw)
    assert size(raw) == 48


def test_eda_task_with_bo():
    from hebo_tpu.optimizers.bo_builder import BoBuilder

    task = EDASeqOptTask(netlist_path=random_aag(seed=5), seq_len=4)
    space = task.space
    opt = BoBuilder(
        "gp_to", "ls", "ei", "none", model_kwargs={"num_epochs": 8}
    ).build_bo(space, n_init=4)
    for _ in range(4):
        rec = opt.suggest(2)
        opt.observe(rec, task(rec))
    assert np.isfinite(opt.best_y)
