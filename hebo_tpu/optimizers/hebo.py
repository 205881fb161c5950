"""HEBO — the flagship optimizer (NeurIPS-2020 BBO winner pipeline).

Parity: reference ``HEBO`` (HEBO/hebo/optimizers/hebo.py:31-229):
  * Sobol random-init phase of ``1 + D`` points (:63-75),
  * power-transformed objective (box-cox / yeo-johnson with retry and raw
    fallback, :127-147),
  * GP surrogate (pSGLD-fit Matérn + categorical embeddings),
  * LCB κ schedule  sqrt(2·ν·((2 + D/2)·ln t + ln(3π²/(3δ)))) (:156-160),
  * MACE 3-objective acquisition optimized by NSGA-II (pop 100, 100 gens),
  * dedupe vs history + random top-up (:166-180),
  * batch selection: random picks overridden by best-σ and best-μ elites
    (:182-193).

TPU-native: the model fit and the full NSGA-II acquisition loop are two
jitted device programs (one per padding bucket), re-used without retracing
as the dataset grows; the host rim only does frame conversion, power
transform (µs-scale sklearn-on-scalars) and dedupe bookkeeping.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..acquisitions.acq import MACE, AcqParams
from ..acq_optimizers.evolution import EvolutionOpt
from ..models import get_model
from ..ops.transforms import fit_power_transform, power_transform_y
from .base import AbstractOptimizer

__all__ = ["HEBO"]


class HEBO(AbstractOptimizer):
    support_parallel_opt = True
    support_combinatorial = True
    support_contextual = True

    def __init__(
        self,
        space,
        model_name: str = "gp",
        rand_sample: Optional[int] = None,
        acq_cls=MACE,
        es: str = "nsga2",
        model_config: Optional[dict] = None,
        csv_save_path: Optional[str] = None,
        scramble_seed: int = 0,
        pop: int = 100,
        iters: int = 100,
    ):
        super().__init__(space, csv_save_path)
        self.model_name = model_name
        self.rand_sample = (
            rand_sample if rand_sample is not None else 1 + space.num_cols
        )
        self.acq_cls = acq_cls
        self.model_config = model_config or {}
        self.scramble_seed = scramble_seed
        self.pop = pop
        self.iters = iters
        self._sobol_count = 0
        self.model = None
        self._evo = None

    # -------------------------------------------------------------- suggest
    def quasi_sample(self, n: int, fix_input: Optional[dict] = None) -> pd.DataFrame:
        X = self.space.sobol_sample_opt(
            n, seed=self.scramble_seed + self._sobol_count
        )
        self._sobol_count += 1
        df = self.space.inverse_transform(X)
        if fix_input:
            for k, v in fix_input.items():
                df[k] = v
        return df

    def method_suggest(self, n_suggestions=1, fix_input=None):
        import time

        if self.num_obs < self.rand_sample:
            return self.quasi_sample(n_suggestions, fix_input)

        space = self.space
        X = space.transform(self.X)
        yr = self.y[:, 0].copy()
        valid = np.isfinite(yr) & np.all(np.isfinite(X), axis=1)
        Xv, yv = X[valid], yr[valid]

        # power-transform y (box-cox/yeo-johnson, fallback raw — :127-147)
        pt = fit_power_transform(yv)
        yt = power_transform_y(yv, pt).reshape(-1, 1)

        t0 = time.time()
        if self.model is None:
            self.model = get_model(self.model_name, space, num_out=1, **self.model_config)
        self.model.fit(Xv, yt)
        self.fit_time.append(time.time() - t0)

        # incumbent in the transformed frame: model prediction at best point
        best_id = int(np.argmin(yt[:, 0]))
        py, ps2 = self.model.predict(Xv[best_id : best_id + 1])
        py_best = float(py[0, 0])
        noise_scale = float(np.sqrt(self.model.noise[0]))

        # κ schedule (:156-160)
        t = max(1, self.num_obs // n_suggestions)
        upsi, delta = 0.5, 0.01
        D = space.num_cols
        kappa = math.sqrt(
            2.0 * upsi * ((2.0 + D / 2.0) * math.log(max(t, 1)) + math.log(3 * math.pi**2 / (3 * delta)))
        )

        if not hasattr(self, "_acq"):
            self._acq = self.acq_cls() if isinstance(self.acq_cls, type) else self.acq_cls
        acq = self._acq
        params = AcqParams(
            tau=jnp.float32(py_best),
            kappa=jnp.float32(kappa),
            eps=jnp.float32(1e-4),
            key=jax.random.PRNGKey(self.num_obs),
            noise=jnp.float32(noise_scale),
        )

        t0 = time.time()
        if self._evo is None:
            self._evo = EvolutionOpt(space, acq, pop=self.pop, iters=self.iters)
        self._evo.acq = acq
        init = np.vstack([Xv[best_id : best_id + 1]] * 1)
        pop_X, pop_F = self._evo.optimize(
            model=self.model,
            acq_params=params,
            initial_suggest=init,
            fix_input=fix_input,
            return_pop=True,
            seed=self.num_obs,
        )
        self.acq_time.append(time.time() - t0)

        # dedupe vs history + random top-up (:166-180)
        hist = {tuple(np.round(r, 6)) for r in X}
        fresh_idx = [
            i for i, r in enumerate(pop_X) if tuple(np.round(r, 6)) not in hist
        ]
        # unique within the population too
        seen, uniq = set(), []
        for i in fresh_idx:
            k = tuple(np.round(pop_X[i], 6))
            if k not in seen:
                seen.add(k)
                uniq.append(i)
        fresh_idx = uniq

        rng = np.random.default_rng(self.num_obs)
        if len(fresh_idx) >= n_suggestions:
            pick = rng.choice(len(fresh_idx), n_suggestions, replace=False)
            sel = [fresh_idx[i] for i in pick]
            rec = pop_X[sel]
            rec_F = pop_F[sel]
            # elite overrides (:182-193): best-σ explorer + best-μ exploiter
            mu, var = self.model.predict(pop_X[fresh_idx])
            explore = fresh_idx[int(np.argmax(var[:, 0]))]
            exploit = fresh_idx[int(np.argmin(mu[:, 0]))]
            rec[0] = pop_X[explore]
            if n_suggestions > 1:
                rec[1] = pop_X[exploit]
        else:
            n_rand = n_suggestions - len(fresh_idx)
            rec = np.vstack(
                [pop_X[fresh_idx].reshape(-1, space.num_cols)]
                + [self.space.sobol_sample_opt(n_rand, seed=int(rng.integers(1 << 30)))]
            )

        df = space.inverse_transform(rec[:n_suggestions])
        if fix_input:
            for k, v in fix_input.items():
                df[k] = v
        return df
