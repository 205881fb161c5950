"""Experiment runner: task × optimizer → per-eval results frame.

Parity: MCBO ``run_experiment`` (MCBO/mcbo/utils/experiment_utils.py:308)
and the RDUCB/AntBO experiment drivers — budgeted ask/tell loop with
timing, logging, and optional checkpointing each iteration.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from .checkpoint import save_optimizer
from .results_logger import ResultsLogger

__all__ = ["run_experiment"]


def run_experiment(
    task: Callable,
    optimizer,
    max_evals: int = 64,
    batch: int = 4,
    save_path: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    verbose: bool = False,
) -> ResultsLogger:
    logger = ResultsLogger(save_path=save_path)
    while len(logger.rows) < max_evals:
        n = min(batch, max_evals - len(logger.rows))
        t0 = time.time()
        rec = optimizer.suggest(n)
        t_sug = time.time() - t0
        t0 = time.time()
        y = np.asarray(task(rec), float).reshape(len(rec), -1)
        t_eval = time.time() - t0
        t0 = time.time()
        optimizer.observe(rec, y)
        t_obs = time.time() - t0
        logger.append(
            y[:, 0], suggest_time=t_sug, observe_time=t_obs, eval_time=t_eval
        )
        if checkpoint_path:
            save_optimizer(optimizer, checkpoint_path)
        if verbose:
            print(
                f"evals={len(logger.rows)} best={logger._best:.4f} "
                f"suggest={t_sug:.2f}s"
            )
    return logger
