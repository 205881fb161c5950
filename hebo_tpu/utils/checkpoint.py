"""Checkpoint / resume for ask/tell optimizers.

Parity: AntBO's checkpoint discipline — pickle the optimizer plus all RNG
states every iteration, ``--resume`` reloads (AntBO/bo/main.py:167-196,
228-229).  The TPU-native state is simpler and *deterministic by
construction*: ask/tell optimizers here are functions of
(X, y, seed counters, TR state) — explicit JAX PRNG keys replace pickled
global-RNG snapshots (SURVEY.md §5.4), so save/restore is a small dict of
numpy arrays + scalars.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np
import pandas as pd

__all__ = ["save_optimizer", "load_optimizer", "optimizer_state_dict", "restore_optimizer_state"]

_SCALAR_ATTRS = [
    "_sobol_count",
    "_suggest_count",
    "_seed",
    "rand_sample",
    "n_init",
]


def optimizer_state_dict(opt) -> Dict[str, Any]:
    """Extract the resumable state of any AbstractOptimizer subclass."""
    d: Dict[str, Any] = {
        "X": opt.X.to_dict("list"),
        "y": np.asarray(opt.y),
        "columns": list(opt.X.columns),
        "scalars": {k: getattr(opt, k) for k in _SCALAR_ATTRS if hasattr(opt, k)},
    }
    tr = getattr(opt, "tr_manager", None)
    if tr is not None:
        d["tr"] = {
            "center": None if tr.center is None else np.asarray(tr.center),
            "radius": getattr(tr, "radius", None),
            "cat_radius": getattr(tr, "cat_radius", None),
            "succ_count": getattr(tr, "succ_count", 0),
            "fail_count": getattr(tr, "fail_count", 0),
            "restart_count": getattr(tr, "restart_count", 0),
            "prev_centers": [np.asarray(c) for c in getattr(tr, "prev_centers", [])],
        }
    return d


def restore_optimizer_state(opt, d: Dict[str, Any]):
    opt.X = pd.DataFrame(d["X"], columns=d["columns"])
    opt.y = np.asarray(d["y"])
    for k, v in d.get("scalars", {}).items():
        if hasattr(opt, k):
            setattr(opt, k, v)
    tr = getattr(opt, "tr_manager", None)
    if tr is not None and "tr" in d:
        td = d["tr"]
        tr.center = None if td["center"] is None else np.asarray(td["center"])
        for k in ("radius", "cat_radius", "succ_count", "fail_count", "restart_count"):
            if td.get(k) is not None and hasattr(tr, k):
                setattr(tr, k, td[k])
        if hasattr(tr, "prev_centers"):
            tr.prev_centers = [np.asarray(c) for c in td.get("prev_centers", [])]
    return opt


def save_optimizer(opt, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(optimizer_state_dict(opt), f)


def load_optimizer(opt, path: str):
    """Restore state into a freshly-constructed optimizer of the same
    config (models refit from data on the next suggest — the optimizer is
    a function of (X, y))."""
    with open(path, "rb") as f:
        d = pickle.load(f)
    return restore_optimizer_state(opt, d)
