"""NoisyOpt: HEBO variant for noisy objectives.

Parity: reference ``NoisyOpt`` (HEBO/hebo/optimizers/noisy_opt.py, 89 LoC):
uses ``NoisyAcq`` — objectives are posterior *samples* rather than
posterior moments, so repeated suggestions hedge over observation noise —
and returns suggestions drawn from the full NSGA-II population.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..acquisitions.acq import Acquisition, AcqParams
from .hebo import HEBO

__all__ = ["NoisyAcq", "NoisyOpt"]


class NoisyAcq(Acquisition):
    """Multi-objective acquisition whose objectives are independent
    posterior-sample realizations (reference acq.py:173-190)."""

    def __init__(self, num_samples: int = 3):
        self.num_obj = num_samples
        self.num_constr = 0

    def eval_pure(self, model, state, params, X):
        mu, var = model.predict_pure(state, X)
        sigma = jnp.sqrt(jnp.maximum(var, 1e-12))
        key = params.key if params.key is not None else jax.random.PRNGKey(0)
        # common random numbers: one eps per objective, shared across X so
        # the sampled functions are coherent surfaces
        eps = jax.random.normal(key, (1, self.num_obj), mu.dtype)
        return mu + sigma * eps


class NoisyOpt(HEBO):
    def __init__(self, space, num_samples: int = 3, **kw):
        kw.setdefault("acq_cls", NoisyAcq(num_samples))
        super().__init__(space, **kw)
