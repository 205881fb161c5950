"""CMA-ES with restarts, as a jitted device update.

Parity: reference ``CMAES`` (HEBO/hebo/optimizers/cmaes.py:10-212): full
rank-μ update with evolution-path cumulation, sigma step-size control,
restart on degenerate covariance or tiny step, bound handling by
resample + reflect.  The reference implements it in torch on CPU; here the
per-generation update (weighted mean, path updates, rank-1 + rank-μ
covariance update, eigendecomposition) is one jitted jnp program over
fixed (λ, D) shapes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import AbstractOptimizer

__all__ = ["CMAES"]


class CMAState(NamedTuple):
    mean: jnp.ndarray  # (D,)
    sigma: jnp.ndarray  # ()
    C: jnp.ndarray  # (D, D)
    p_sigma: jnp.ndarray  # (D,)
    p_c: jnp.ndarray  # (D,)
    count: jnp.ndarray  # () generations


def _init_state(D: int, mean, sigma: float) -> CMAState:
    return CMAState(
        mean=jnp.asarray(mean, jnp.float32),
        sigma=jnp.asarray(sigma, jnp.float32),
        C=jnp.eye(D, dtype=jnp.float32),
        p_sigma=jnp.zeros(D, jnp.float32),
        p_c=jnp.zeros(D, jnp.float32),
        count=jnp.asarray(0, jnp.int32),
    )


@partial(jax.jit, static_argnames=("lam", "mu"))
def _cma_sample(key, state: CMAState, lam: int, mu: int, lb, ub):
    """Draw λ candidates ~ N(m, σ²C) with reflect bound handling."""
    D = state.mean.shape[0]
    w, d = jnp.linalg.eigh(state.C)
    w = jnp.maximum(w, 1e-12)
    B = d * jnp.sqrt(w)[None, :]  # C^(1/2)
    z = jax.random.normal(key, (lam, D), jnp.float32)
    x = state.mean[None, :] + state.sigma * (z @ B.T)
    # reflect into bounds
    span = ub - lb
    x = jnp.where(x < lb, lb + jnp.minimum(lb - x, span), x)
    x = jnp.where(x > ub, ub - jnp.minimum(x - ub, span), x)
    return jnp.clip(x, lb, ub)


@partial(jax.jit, static_argnames=("lam", "mu"))
def _cma_update(state: CMAState, X: jnp.ndarray, y: jnp.ndarray, lam: int, mu: int):
    """One CMA-ES generation update from evaluated candidates."""
    D = state.mean.shape[0]
    # standard weights & constants (Hansen tutorial)
    w = jnp.log(mu + 0.5) - jnp.log(jnp.arange(1, mu + 1, dtype=jnp.float32))
    w = w / jnp.sum(w)
    mu_eff = 1.0 / jnp.sum(w**2)
    c_sigma = (mu_eff + 2.0) / (D + mu_eff + 5.0)
    d_sigma = 1.0 + 2.0 * jnp.maximum(0.0, jnp.sqrt((mu_eff - 1.0) / (D + 1.0)) - 1.0) + c_sigma
    c_c = (4.0 + mu_eff / D) / (D + 4.0 + 2.0 * mu_eff / D)
    c_1 = 2.0 / ((D + 1.3) ** 2 + mu_eff)
    c_mu = jnp.minimum(
        1.0 - c_1, 2.0 * (mu_eff - 2.0 + 1.0 / mu_eff) / ((D + 2.0) ** 2 + mu_eff)
    )
    chi_n = math.sqrt(D) * (1.0 - 1.0 / (4.0 * D) + 1.0 / (21.0 * D**2))

    order = jnp.argsort(y[:, 0])[:mu]
    Xb = X[order]  # (mu, D)
    old_mean = state.mean
    mean = jnp.sum(w[:, None] * Xb, axis=0)

    # C^(-1/2) via eigh
    evals, evecs = jnp.linalg.eigh(state.C)
    evals = jnp.maximum(evals, 1e-12)
    C_isqrt = (evecs / jnp.sqrt(evals)[None, :]) @ evecs.T

    y_w = (mean - old_mean) / state.sigma
    p_sigma = (1.0 - c_sigma) * state.p_sigma + jnp.sqrt(
        c_sigma * (2.0 - c_sigma) * mu_eff
    ) * (C_isqrt @ y_w)
    ps_norm = jnp.linalg.norm(p_sigma)
    sigma = state.sigma * jnp.exp((c_sigma / d_sigma) * (ps_norm / chi_n - 1.0))

    h_sigma = (
        ps_norm
        / jnp.sqrt(1.0 - (1.0 - c_sigma) ** (2.0 * (state.count + 1.0)))
        < (1.4 + 2.0 / (D + 1.0)) * chi_n
    ).astype(jnp.float32)
    p_c = (1.0 - c_c) * state.p_c + h_sigma * jnp.sqrt(
        c_c * (2.0 - c_c) * mu_eff
    ) * y_w

    dX = (Xb - old_mean[None, :]) / state.sigma
    rank_mu = jnp.einsum("k,ki,kj->ij", w, dX, dX)
    C = (
        (1.0 - c_1 - c_mu) * state.C
        + c_1 * (jnp.outer(p_c, p_c) + (1.0 - h_sigma) * c_c * (2.0 - c_c) * state.C)
        + c_mu * rank_mu
    )
    C = 0.5 * (C + C.T)
    return CMAState(mean, sigma, C, p_sigma, p_c, state.count + 1)


class CMAES(AbstractOptimizer):
    """Ask/tell CMA-ES over the continuous opt frame (discrete dims are
    rounded through inverse_transform)."""

    support_parallel_opt = True

    def __init__(
        self,
        space,
        lam: Optional[int] = None,
        sigma0: float = 0.3,
        csv_save_path: Optional[str] = None,
    ):
        super().__init__(space, csv_save_path)
        D = space.num_cols
        self.lam = lam if lam is not None else 4 + int(3 * math.log(D))
        self.mu = self.lam // 2
        self.lb = jnp.asarray(space.opt_lb, jnp.float32)
        self.ub = jnp.asarray(space.opt_ub, jnp.float32)
        span = np.asarray(space.opt_ub - space.opt_lb)
        self.sigma0 = sigma0 * float(np.mean(span))
        self._restart()
        self._key = jax.random.PRNGKey(0)
        self._pending: Optional[np.ndarray] = None
        self.n_restarts = 0

    def _restart(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        mean = np.asarray(
            self.space.opt_lb + rng.random(self.space.num_cols)
            * (self.space.opt_ub - self.space.opt_lb)
        )
        self.state = _init_state(self.space.num_cols, mean, self.sigma0)

    def suggest(self, n_suggestions=None, fix_input=None):
        # default to a full generation of λ candidates (population-based
        # ask/tell: the reference's CMAES also suggests λ by default)
        return super().suggest(n_suggestions, fix_input)

    def method_suggest(self, n_suggestions=None, fix_input=None):
        n = self.lam if n_suggestions is None else n_suggestions
        self._key, k = jax.random.split(self._key)
        X = np.asarray(_cma_sample(k, self.state, n, self.mu, self.lb, self.ub))
        self._pending = X
        return self.space.inverse_transform(self.space.round_opt(X))

    def observe_new_data(self, Xdf, y):
        if self._pending is None or len(Xdf) < self.mu:
            return
        X = jnp.asarray(self._pending[: len(Xdf)], jnp.float32)
        yv = np.asarray(y[:, :1], np.float32)
        yv[~np.isfinite(yv)] = np.nanmax(yv[np.isfinite(yv)]) if np.any(np.isfinite(yv)) else 0.0
        self.state = _cma_update(self.state, X, jnp.asarray(yv), len(Xdf), self.mu)
        self._pending = None
        # restart on degenerate covariance or vanishing step (cmaes.py:10-212)
        sig = float(self.state.sigma)
        cond_bad = not np.all(np.isfinite(np.asarray(self.state.C)))
        if cond_bad or sig < 1e-9 or sig > 1e6:
            self.n_restarts += 1
            self._restart(seed=self.n_restarts)
