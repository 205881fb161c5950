"""NoMR: two-stage optimizer — explore with HEBO until the objective drops
below a threshold η, then exploit with a low-κ BO around it.

Parity: reference ``NoMR_BO`` + ``AbsEtaDifference`` acquisition
(HEBO/hebo/optimizers/nomr.py, 93 LoC).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..acquisitions.acq import Acquisition
from .bo import BO
from .base import AbstractOptimizer
from .hebo import HEBO

__all__ = ["AbsEtaDifference", "NoMR_BO"]


class AbsEtaDifference(Acquisition):
    """|μ - η| - κσ: seek points whose value matches the target η."""

    def __init__(self, eta: float = 0.0, kappa: float = 0.6):
        self.eta = eta
        self.kappa = kappa

    def eval_pure(self, model, state, params, X):
        mu, var = model.predict_pure(state, X)
        sigma = jnp.sqrt(jnp.maximum(var, 1e-12))
        return jnp.abs(mu - self.eta) - self.kappa * sigma


class NoMR_BO(AbstractOptimizer):
    def __init__(self, space, eta: float = 0.0, kappa_exploit: float = 0.6, **kw):
        super().__init__(space, kw.pop("csv_save_path", None))
        self.eta = eta
        self.stage1 = HEBO(space, **kw)
        self.stage2 = BO(space, kappa=kappa_exploit, **kw)
        self._exploiting = False

    def method_suggest(self, n_suggestions=1, fix_input=None):
        if not self._exploiting:
            return self.stage1.method_suggest(n_suggestions, fix_input)
        return self.stage2.method_suggest(n_suggestions, fix_input)

    def observe_new_data(self, Xdf, y):
        self.stage1.X = self.X
        self.stage1.y = self.y
        self.stage2.X = self.X
        self.stage2.y = self.y
        if not self._exploiting and self.best_y < self.eta:
            self._exploiting = True
