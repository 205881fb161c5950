"""Pure evolutionary ask/tell optimizer (no surrogate).

Parity: reference ``Evolution`` (HEBO/hebo/optimizers/evolution.py:25-131):
pymoo GA/NSGA-II exposed through the HEBO suggest/observe API — the
population persists across calls; ``observe`` performs the survival +
mating step.  Here one generation = one jitted device step reusing the
NSGA-II operators from acq_optimizers.evolution.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..acq_optimizers.evolution import (
    EvolveSpaceMeta,
    _cat_ops,
    _poly_mutation,
    _round_discrete,
    _sbx_crossover,
    _space_meta,
)
from ..ops.pareto import crowding_distance, nondominated_rank, nsga2_key
from .base import AbstractOptimizer

__all__ = ["Evolution"]


@partial(jax.jit, static_argnames=("meta",))
def _mate(key, X, F, meta: EvolveSpaceMeta):
    """Survival bookkeeping + one round of mating → offspring."""
    P = X.shape[0]
    lb = jnp.asarray(meta.lb, jnp.float32)
    ub = jnp.asarray(meta.ub, jnp.float32)
    cat = jnp.asarray(meta.is_cat)
    k_sel, k_sbx, k_mut, k_cat = jax.random.split(key, 4)
    rank = nondominated_rank(F)
    crowd = crowding_distance(F, rank)
    skey = nsga2_key(rank, crowd)
    idx = jax.random.randint(k_sel, (2, P), 0, P)
    win = jnp.where(skey[idx[0]] <= skey[idx[1]], idx[0], idx[1])
    mate_idx = jnp.roll(win, 1)
    p1, p2 = X[win], X[mate_idx]
    child_c = _sbx_crossover(k_sbx, p1, p2, lb, ub)
    child_c = _poly_mutation(k_mut, child_c, lb, ub)
    child_k = _cat_ops(k_cat, p1, p2, lb, ub)
    child = jnp.where(cat[None, :], child_k, child_c)
    return _round_discrete(child, meta)


@partial(jax.jit, static_argnames=("meta", "pop_size"))
def _survive(X_all, F_all, meta: EvolveSpaceMeta, pop_size: int):
    rank = nondominated_rank(F_all)
    crowd = crowding_distance(F_all, rank)
    order = jnp.argsort(nsga2_key(rank, crowd))[:pop_size]
    return X_all[order], F_all[order]


class Evolution(AbstractOptimizer):
    support_parallel_opt = True
    support_multi_objective = True
    support_combinatorial = True

    def __init__(
        self,
        space,
        num_obj: int = 1,
        pop: int = 100,
        csv_save_path: Optional[str] = None,
    ):
        super().__init__(space, csv_save_path)
        self.num_obj = num_obj
        self.pop = pop
        self.meta = _space_meta(space)
        self._X_pop: Optional[np.ndarray] = None
        self._F_pop: Optional[np.ndarray] = None
        self._key = jax.random.PRNGKey(0)
        self._pending: Optional[np.ndarray] = None

    def suggest(self, n_suggestions=None, fix_input=None):
        # default to one full generation (population ask/tell)
        return super().suggest(n_suggestions, fix_input)

    def method_suggest(self, n_suggestions=None, fix_input=None):
        n = self.pop if n_suggestions is None else n_suggestions
        if self._X_pop is None:
            X = self.space.sobol_sample_opt(n, seed=0)
        else:
            self._key, k = jax.random.split(self._key)
            # mate from the current survived population
            Xp = jnp.asarray(self._X_pop, jnp.float32)
            Fp = jnp.asarray(self._F_pop, jnp.float32)
            child = np.asarray(_mate(k, Xp, Fp, self.meta))
            X = child[:n] if n <= len(child) else np.vstack(
                [child, self.space.sobol_sample_opt(n - len(child), seed=self.num_obs)]
            )
        self._pending = X
        return self.space.inverse_transform(X)

    def observe_new_data(self, Xdf, y):
        Xn = self.space.transform(Xdf).astype(np.float32)
        F = np.asarray(y[:, : self.num_obj], np.float32)
        bad = ~np.all(np.isfinite(F), axis=1)
        if np.any(bad):
            fill = np.nanmax(F[~bad], axis=0) if np.any(~bad) else np.ones(self.num_obj)
            F[bad] = fill + 1.0
        if self._X_pop is None:
            self._X_pop, self._F_pop = Xn, F
            return
        X_all = np.vstack([self._X_pop, Xn])
        F_all = np.vstack([self._F_pop, F])
        keep = min(self.pop, len(X_all))
        Xs, Fs = _survive(
            jnp.asarray(X_all), jnp.asarray(F_all), self.meta, keep
        )
        self._X_pop, self._F_pop = np.asarray(Xs), np.asarray(Fs)
