"""On-device mixed-variable NSGA-II / GA acquisition optimizer.

Parity: reference ``EvolutionOpt``
(HEBO/hebo/acq_optimizers/evolution_optimizer.py:26-160), which wraps
pymoo's mixed-variable NSGA-II (multi-objective) or GA (single-objective)
with Sobol-initialised population, incumbent injection, duplicate
elimination and `fix_input` support for contextual BO.

TPU-native design: the ENTIRE evolutionary loop is one jitted program —
population ``(P, D)`` as the leading batch axis, generations via
``lax.scan``, nondominated sort + crowding as fixed-shape XLA ops
(hebo_tpu.ops.pareto).  One generation = one fused device step; the 10⁴
surrogate posterior evaluations of a HEBO suggest (100 gens × pop 100)
never leave the chip.  The search distribution mirrors pymoo's
MixedVariableMating: SBX crossover + polynomial mutation on continuous
dims, uniform crossover + random-reset mutation on categorical dims,
binary tournament on (rank, crowding).

Cross-device scaling: islands of sub-populations run under ``shard_map``
with a periodic all-gather migration (hebo_tpu.parallel.islands).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.pareto import crowding_distance, nondominated_rank, nsga2_key

__all__ = ["EvolutionOpt", "evolve", "EvolveSpaceMeta"]


class EvolveSpaceMeta(NamedTuple):
    """Static space metadata baked into the jitted program."""

    lb: Tuple[float, ...]
    ub: Tuple[float, ...]
    is_discrete: Tuple[bool, ...]  # rounded at eval + on output
    is_cat: Tuple[bool, ...]  # random-reset mutation instead of polynomial
    fix_mask: Tuple[bool, ...] = ()  # fixed (contextual) columns


def _space_meta(space, fix_input=None) -> EvolveSpaceMeta:
    D = space.num_cols
    is_cat = [False] * D
    for c in space.cat_dims:
        is_cat[c] = True
    is_disc = [False] * D
    for c in space.cat_dims + space.discrete_numeric_dims + space.perm_dims:
        is_disc[c] = True
    fix = [False] * D
    if fix_input:
        for name in fix_input:
            p = space.params[name]
            c0 = space._col_of[name]
            for j in range(p.num_cols):
                fix[c0 + j] = True
    return EvolveSpaceMeta(
        lb=tuple(space.opt_lb.tolist()),
        ub=tuple(space.opt_ub.tolist()),
        is_discrete=tuple(is_disc),
        is_cat=tuple(is_cat),
        fix_mask=tuple(fix),
    )


def _round_discrete(X, meta: EvolveSpaceMeta):
    disc = jnp.asarray(meta.is_discrete)
    lb = jnp.asarray(meta.lb, X.dtype)
    ub = jnp.asarray(meta.ub, X.dtype)
    Xr = jnp.where(disc[None, :], jnp.round(X), X)
    return jnp.clip(Xr, lb, ub)


def _sbx_crossover(key, p1, p2, lb, ub, eta=15.0, prob=0.9):
    """Simulated binary crossover (per-dim), pymoo-compatible."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, p1.shape)
    beta = jnp.where(
        u <= 0.5,
        (2.0 * u) ** (1.0 / (eta + 1.0)),
        (1.0 / (2.0 * (1.0 - u) + 1e-12)) ** (1.0 / (eta + 1.0)),
    )
    do = jax.random.uniform(k2, p1.shape) < prob
    c1 = 0.5 * ((1 + beta) * p1 + (1 - beta) * p2)
    c2 = 0.5 * ((1 - beta) * p1 + (1 + beta) * p2)
    swap = jax.random.uniform(k3, p1.shape) < 0.5
    child = jnp.where(swap, c1, c2)
    child = jnp.where(do, child, p1)
    return jnp.clip(child, lb, ub)


def _poly_mutation(key, x, lb, ub, eta=20.0, prob=None):
    """Polynomial mutation, pymoo-compatible."""
    D = x.shape[-1]
    prob = 1.0 / D if prob is None else prob
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, x.shape)
    span = ub - lb
    delta1 = (x - lb) / (span + 1e-12)
    delta2 = (ub - x) / (span + 1e-12)
    lo = (2.0 * u + (1.0 - 2.0 * u) * (1.0 - delta1) ** (eta + 1.0)) ** (
        1.0 / (eta + 1.0)
    ) - 1.0
    hi = 1.0 - (
        2.0 * (1.0 - u) + 2.0 * (u - 0.5) * (1.0 - delta2) ** (eta + 1.0)
    ) ** (1.0 / (eta + 1.0))
    deltaq = jnp.where(u <= 0.5, lo, hi)
    do = jax.random.uniform(k2, x.shape) < prob
    return jnp.clip(jnp.where(do, x + deltaq * span, x), lb, ub)


def _cat_ops(key, p1, p2, lb, ub, prob_mut=None):
    """Uniform crossover + random-reset mutation for categorical columns."""
    D = p1.shape[-1]
    prob_mut = 1.0 / D if prob_mut is None else prob_mut
    k1, k2, k3 = jax.random.split(key, 3)
    take2 = jax.random.uniform(k1, p1.shape) < 0.5
    child = jnp.where(take2, p2, p1)
    reset = jax.random.uniform(k2, p1.shape) < prob_mut
    u = jax.random.uniform(k3, p1.shape)
    rand_cat = jnp.floor(lb + u * (ub - lb + 1.0))
    return jnp.where(reset, jnp.clip(rand_cat, lb, ub), child)


def evolve_raw(
    key: jax.Array,
    init_pop: jnp.ndarray,
    eval_args,
    *,
    eval_fn,
    meta: EvolveSpaceMeta,
    n_gens: int = 100,
):
    """Unjitted evolutionary loop — composable inside shard_map (island
    parallelism, hebo_tpu.parallel) or vmapped restarts.

    ``eval_fn(eval_args, X) → (P, n_out)`` pure; ``eval_args`` is the
    dynamic pytree (model state + acq params) so refits don't retrace.
    Returns (final population X (P, D), objectives F (P, n_out)).
    """
    P, D = init_pop.shape
    lb = jnp.asarray(meta.lb, jnp.float32)
    ub = jnp.asarray(meta.ub, jnp.float32)
    cat = jnp.asarray(meta.is_cat)
    fix = jnp.asarray(meta.fix_mask) if meta.fix_mask else jnp.zeros((D,), bool)

    def evaluate(X):
        return eval_fn(eval_args, _round_discrete(X, meta))

    def gen_step(carry, _):
        X, F, k = carry
        k, k_sel, k_sbx, k_mut, k_cat = jax.random.split(k, 5)
        rank = nondominated_rank(F)
        crowd = crowding_distance(F, rank)
        skey = nsga2_key(rank, crowd)
        # binary tournament: two random opponents per child slot
        idx = jax.random.randint(k_sel, (2, P), 0, P)
        win = jnp.where(skey[idx[0]] <= skey[idx[1]], idx[0], idx[1])
        mate = jnp.roll(win, 1)
        p1, p2 = X[win], X[mate]
        # continuous path
        child_c = _sbx_crossover(k_sbx, p1, p2, lb, ub)
        child_c = _poly_mutation(k_mut, child_c, lb, ub)
        # categorical path
        child_k = _cat_ops(k_cat, p1, p2, lb, ub)
        child = jnp.where(cat[None, :], child_k, child_c)
        child = jnp.where(fix[None, :], p1, child)  # contextual fix_input
        Fc = evaluate(child)
        # (μ+λ) survival: best P of parents ∪ children
        Xall = jnp.concatenate([X, child], axis=0)
        Fall = jnp.concatenate([F, Fc], axis=0)
        rank_all = nondominated_rank(Fall)
        crowd_all = crowding_distance(Fall, rank_all)
        order = jnp.argsort(nsga2_key(rank_all, crowd_all))[:P]
        return (Xall[order], Fall[order], k), None

    F0 = evaluate(init_pop)
    (Xf, Ff, _), _ = lax.scan(gen_step, (init_pop, F0, key), None, length=n_gens)
    return _round_discrete(Xf, meta), Ff


evolve = jax.jit(evolve_raw, static_argnames=("eval_fn", "meta", "n_gens"))


class EvolutionOpt:
    """Host-side wrapper with the reference EvolutionOpt API."""

    def __init__(
        self,
        space,
        acq,
        pop: int = 100,
        iters: int = 100,
        es: Optional[str] = None,  # 'nsga2' | 'ga' — inferred from acq
        sobol_init: bool = True,
        verbose: bool = False,
    ):
        self.space = space
        self.acq = acq
        self.pop = pop
        self.iters = iters
        self.sobol_init = sobol_init
        # eval_fn must be a *stable function object* per (acq, model) pair:
        # jax.jit keys its trace cache on the static eval_fn identity, so a
        # fresh closure per optimize() would retrace every BO iteration.
        self._eval_fn_cache = {}

    def optimize(
        self,
        model=None,
        acq_params=None,
        initial_suggest: Optional[np.ndarray] = None,
        fix_input: Optional[dict] = None,
        return_pop: bool = False,
        seed: int = 0,
    ) -> np.ndarray:
        """→ opt-frame array: best point (1, D), or the population if
        ``return_pop`` (reference returns whole pop for batch selection)."""
        meta = _space_meta(self.space, fix_input)
        X0 = (
            self.space.sobol_sample_opt(self.pop, seed=seed)
            if self.sobol_init
            else self.space.transform(self.space.sample(self.pop, seed=seed))
        )
        if initial_suggest is not None:
            k = min(len(initial_suggest), self.pop)
            X0[:k] = np.asarray(initial_suggest)[:k]
        if fix_input:
            for name, val in fix_input.items():
                p = self.space.params[name]
                c0 = self.space._col_of[name]
                tv = np.asarray(p.transform(np.asarray([val]))).ravel()
                X0[:, c0 : c0 + p.num_cols] = tv[None, :]
        acq = self.acq

        state = model.state if model is not None else None

        ck = (id(acq), id(model))
        # the cache value pins strong refs to (acq, model) so their ids
        # cannot be recycled by the GC while the cached closure is alive
        # (id-keyed caches alias after collection otherwise)
        hit = self._eval_fn_cache.get(ck)
        if hit is not None and (hit[1] is acq) and (hit[2] is model):
            eval_fn = hit[0]
        else:

            def eval_fn(args, X):
                st, pr = args
                return acq.eval_pure(model, st, pr, X)

            self._eval_fn_cache[ck] = (eval_fn, acq, model)

        from ..acquisitions.acq import AcqParams

        pr = acq_params if acq_params is not None else AcqParams()
        Xf, Ff = evolve(
            jax.random.PRNGKey(seed),
            jnp.asarray(X0, jnp.float32),
            (state, pr),
            eval_fn=eval_fn,
            meta=meta,
            n_gens=self.iters,
        )
        Xf = np.asarray(Xf)
        Ff = np.asarray(Ff)
        if return_pop:
            return self.space.round_opt(Xf), Ff
        # single best: for multi-objective return the best-LCB point
        best = int(np.argmin(Ff[:, 0]))
        return self.space.round_opt(Xf[best : best + 1])
