"""GeneralBO: multi-objective + constrained BO with EHVI batch selection.

Parity: reference ``GeneralBO`` (HEBO/hebo/optimizers/general.py:16-204):
multi-output surrogate, ``GeneralAcq`` (per-output LCB objectives +
feasibility constraints), NSGA-II population, and batch selection by
Monte-Carlo expected-hypervolume-improvement over posterior samples with a
nondominated filter (EHVI loop :110-139, ``get_pf`` :160-172).

TPU-native: the greedy EHVI selection loop evaluates MC hypervolume on
device (ops/pareto.hypervolume_mc) over the candidate population in one
vmapped pass per greedy round.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..acquisitions.acq import AcqParams, GeneralAcq
from ..acq_optimizers.evolution import EvolutionOpt
from ..models import get_model
from ..ops.pareto import hypervolume_mc, pareto_mask
from .base import AbstractOptimizer

__all__ = ["GeneralBO"]


class GeneralBO(AbstractOptimizer):
    support_multi_objective = True
    support_constraint = True
    support_parallel_opt = True

    def __init__(
        self,
        space,
        num_obj: int = 1,
        num_constr: int = 0,
        model_name: str = "multi_task",
        rand_sample: Optional[int] = None,
        kappa: float = 2.0,
        c_kappa: float = 0.0,
        model_config: Optional[dict] = None,
        pop: int = 100,
        iters: int = 100,
        csv_save_path: Optional[str] = None,
    ):
        super().__init__(space, csv_save_path)
        self.num_obj = num_obj
        self.num_constr = num_constr
        self.num_out = num_obj + num_constr
        self.model_name = model_name
        self.rand_sample = rand_sample if rand_sample is not None else 1 + space.num_cols
        self.model_config = model_config or {}
        self.pop = pop
        self.iters = iters
        self._acq = GeneralAcq(num_obj, num_constr, kappa=kappa, c_kappa=c_kappa)
        self.model = None
        self._evo = None
        self._sobol_count = 0

    # ------------------------------------------------------------- suggest
    def method_suggest(self, n_suggestions=1, fix_input=None):
        if self.num_obs < self.rand_sample:
            X = self.space.sobol_sample_opt(n_suggestions, seed=self._sobol_count)
            self._sobol_count += 1
            return self.space.inverse_transform(X)

        X = self.space.transform(self.X)
        Y = self.y[:, : self.num_out].copy()
        ok = np.all(np.isfinite(Y), axis=1)
        Xv, Yv = X[ok], Y[ok]
        mu_ = Yv.mean(axis=0)
        sd_ = np.maximum(Yv.std(axis=0), 1e-12)
        Ys = (Yv - mu_) / sd_

        if self.model is None:
            self.model = get_model(
                self.model_name, self.space, num_out=self.num_out, **self.model_config
            )
        self.model.fit(Xv, Ys)

        if self._evo is None:
            self._evo = EvolutionOpt(self.space, self._acq, pop=self.pop, iters=self.iters)
        pop_X, pop_F = self._evo.optimize(
            model=self.model,
            acq_params=AcqParams(),
            fix_input=fix_input,
            return_pop=True,
            seed=self.num_obs,
        )

        if self.num_obj == 1:
            order = np.argsort(pop_F[:, 0])
            rec = pop_X[order[:n_suggestions]]
        else:
            rec = self._ehvi_select(pop_X, n_suggestions, Ys[:, : self.num_obj])
        return self.space.inverse_transform(rec)

    def _ehvi_select(self, cand_X, n, Y_obs):
        """Greedy MC hypervolume-improvement batch selection (:110-139)."""
        mu, var = self.model.predict(cand_X)
        Fc = mu[:, : self.num_obj]
        ref = jnp.asarray(
            np.maximum(Y_obs.max(axis=0), Fc.max(axis=0)) + 0.1, jnp.float32
        )
        pf_obs = Y_obs[np.asarray(pareto_mask(jnp.asarray(Y_obs, jnp.float32)))]
        key = jax.random.PRNGKey(self.num_obs)
        selected = []
        base = jnp.asarray(pf_obs, jnp.float32)
        Fc_j = jnp.asarray(Fc, jnp.float32)
        for _ in range(n):
            key, k = jax.random.split(key)

            def hvi(i):
                F = jnp.vstack([base, Fc_j[i][None, :]])
                return hypervolume_mc(F, ref, k, n_samples=2048)

            hv0 = hypervolume_mc(base, ref, k, n_samples=2048)
            gains = np.asarray(jax.vmap(hvi)(jnp.arange(len(Fc)))) - float(hv0)
            gains[selected] = -np.inf
            pick = int(np.argmax(gains))
            selected.append(pick)
            base = jnp.vstack([base, jnp.asarray(Fc[pick : pick + 1], jnp.float32)])
        return cand_X[selected]

    # ----------------------------------------------------------- incumbent
    def get_pf(self):
        """Observed Pareto front (X DataFrame, Y array)."""
        Y = self.y[:, : self.num_obj]
        ok = np.all(np.isfinite(Y), axis=1)
        mask = np.zeros(len(Y), bool)
        mask[ok] = np.asarray(pareto_mask(jnp.asarray(Y[ok], jnp.float32)))
        return self.X[mask], Y[mask]

    @property
    def best_y(self):
        if self.num_obj == 1:
            return super().best_y
        _, Y = self.get_pf()
        return Y
