"""Vanilla BO: single-suggestion LCB + evolutionary acquisition opt.

Parity: reference ``BO`` (HEBO/hebo/optimizers/bo.py:16-109) — rand-init
phase, GP fit on standardized y, LCB acquisition (fixed κ), GA/NSGA-II
maximization, one suggestion per call (n>1 falls back to random top-up).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..acquisitions.acq import LCB, AcqParams
from ..acq_optimizers.evolution import EvolutionOpt
from ..models import get_model
from .base import AbstractOptimizer

__all__ = ["BO"]


class BO(AbstractOptimizer):
    def __init__(
        self,
        space,
        model_name: str = "gp",
        rand_sample: Optional[int] = None,
        kappa: float = 2.0,
        model_config: Optional[dict] = None,
        pop: int = 100,
        iters: int = 100,
        csv_save_path: Optional[str] = None,
    ):
        super().__init__(space, csv_save_path)
        self.model_name = model_name
        self.rand_sample = rand_sample if rand_sample is not None else 1 + space.num_cols
        self.kappa = kappa
        self.model_config = model_config or {}
        self.pop = pop
        self.iters = iters
        self.model = None
        self._evo = None
        self._acq = LCB()
        self._sobol_count = 0

    def method_suggest(self, n_suggestions=1, fix_input=None):
        if self.num_obs < self.rand_sample or n_suggestions > 1:
            X = self.space.sobol_sample_opt(
                n_suggestions, seed=self._sobol_count
            )
            self._sobol_count += 1
            df = self.space.inverse_transform(X)
            if fix_input:
                for k, v in fix_input.items():
                    df[k] = v
            return df

        X = self.space.transform(self.X)
        y = self.y[:, :1].copy()
        ok = np.isfinite(y[:, 0])
        Xv, yv = X[ok], y[ok]
        ys = (yv - yv.mean()) / max(yv.std(), 1e-12)

        if self.model is None:
            self.model = get_model(self.model_name, self.space, num_out=1, **self.model_config)
        self.model.fit(Xv, ys)

        if self._evo is None:
            self._evo = EvolutionOpt(self.space, self._acq, pop=self.pop, iters=self.iters)
        best_id = int(np.argmin(ys[:, 0]))
        rec = self._evo.optimize(
            model=self.model,
            acq_params=AcqParams(kappa=jnp.float32(self.kappa)),
            initial_suggest=Xv[best_id : best_id + 1],
            fix_input=fix_input,
            seed=self.num_obs,
        )
        df = self.space.inverse_transform(rec)
        if fix_input:
            for k, v in fix_input.items():
                df[k] = v
        return df
