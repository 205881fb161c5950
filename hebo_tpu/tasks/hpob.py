"""HPO-B-style tabular/surrogate benchmark adapter (meta-BO evaluation).

Parity: NAP's offline HPO-B evaluation (NAP/nap/environment/
function_gym_nap.py + results/HPO-B/*.json): BO episodes over *offline*
hyperparameter-response surfaces — suggestions snap to a finite candidate
table with precomputed objective values.

The real HPO-B JSON dumps are not shipped; ``load_json`` accepts the
HPO-B layout when present, and ``SyntheticHPOBTask.make_suite`` generates
GP-sample surrogate tables with the same interface for offline testing
and NAP meta-training.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..design_space import DesignSpace

__all__ = ["TabularBenchmark", "SyntheticHPOBTask"]


class TabularBenchmark:
    """A finite (X, y) table acting as a black box: queries snap to the
    nearest candidate (the HPO-B discrete-search-space protocol)."""

    def __init__(self, X_table: np.ndarray, y_table: np.ndarray,
                 param_names: Optional[List[str]] = None):
        self.X_table = np.asarray(X_table, float)
        self.y_table = np.asarray(y_table, float).reshape(len(X_table))
        D = self.X_table.shape[1]
        self.param_names = param_names or [f"x{i}" for i in range(D)]

    @classmethod
    def load_json(cls, path: str, search_space_id: str, dataset_id: str):
        """HPO-B meta-dataset layout: {space: {dataset: {'X': …, 'y': …}}}."""
        with open(path) as f:
            data = json.load(f)
        entry = data[search_space_id][dataset_id]
        return cls(np.asarray(entry["X"]), np.asarray(entry["y"]))

    @property
    def space(self) -> DesignSpace:
        lb = self.X_table.min(axis=0)
        ub = self.X_table.max(axis=0)
        return DesignSpace([
            {"name": n, "type": "num", "lb": float(l), "ub": float(u + 1e-9)}
            for n, l, u in zip(self.param_names, lb, ub)
        ])

    def _snap(self, X: np.ndarray) -> np.ndarray:
        d = np.sum(
            (X[:, None, :] - self.X_table[None, :, :]) ** 2, axis=-1
        )
        return np.argmin(d, axis=1)

    def __call__(self, df: pd.DataFrame) -> np.ndarray:
        X = df[self.param_names].values.astype(float)
        idx = self._snap(X)
        return self.y_table[idx].reshape(-1, 1)

    @property
    def fmin(self) -> float:
        return float(self.y_table.min())

    def regret(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(y) - self.fmin


class SyntheticHPOBTask(TabularBenchmark):
    """GP-sample surrogate table with the HPO-B interface."""

    def __init__(self, dim: int = 3, n_points: int = 512, seed: int = 0,
                 lengthscale: float = 0.3):
        rng = np.random.default_rng(seed)
        X = rng.random((n_points, dim))
        d2 = np.sum((X[:, None] - X[None, :]) ** 2, axis=-1)
        K = np.exp(-0.5 * d2 / lengthscale**2) + 1e-6 * np.eye(n_points)
        y = np.linalg.cholesky(K) @ rng.standard_normal(n_points)
        super().__init__(X, y)

    @classmethod
    def make_suite(cls, n_tasks: int = 4, dim: int = 3, seed: int = 0):
        return [cls(dim=dim, seed=seed + i) for i in range(n_tasks)]
