"""Bayesian linear regression surrogate (BOCS).

Parity: MCBO ``LinRegModel``
(MCBO/mcbo/models/linear_reagression/linear_regression.py:23-162): order-2
polynomial features over (one-hot) categorical/binary inputs; estimators
``mle`` / ``bayes`` (conjugate normal-inverse-gamma) / ``horseshoe``
(Gibbs sampling, reference n_gibbs=1000); Thompson sampling by drawing
coefficient vectors (the BOCS acquisition).

TPU-native: the horseshoe Gibbs chain — the reference's slowest component
— runs as a ``lax.scan`` of fully vectorized updates (Makalic-Schmidt
auxiliary-variable scheme): each sweep is one p×p Cholesky solve plus
elementwise inverse-gamma draws, all on device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chol import chol_solve, safe_cholesky
from .base import BaseModel, register_model

__all__ = ["LinRegModel"]


def _inv_gamma(key, shape_param, scale):
    """InvGamma(shape, scale) draw via 1 / Gamma(shape, 1/scale)."""
    g = jax.random.gamma(key, shape_param, shape=scale.shape)
    return scale / jnp.maximum(g, 1e-12)


@partial(jax.jit, static_argnames=("n_gibbs",))
def _horseshoe_gibbs(key, Phi, y, n_gibbs: int = 300):
    """Gibbs chain for the horseshoe linear model; returns coefficient
    draws (n_keep, p) from the second half of the chain."""
    n, p = Phi.shape
    PtP = Phi.T @ Phi
    Pty = (Phi.T @ y)[:, 0]

    def sweep(carry, _):
        w, lam2, tau2, nu, xi, sig2, k = carry
        k, k1, k2, k3, k4, k5, k6 = jax.random.split(k, 7)
        # w | rest
        A = PtP + jnp.diag(1.0 / jnp.maximum(tau2 * lam2, 1e-10))
        L, _ok = safe_cholesky(A)
        mean = chol_solve(L, Pty[:, None])[:, 0]
        z = jax.random.normal(k1, (p,))
        w = mean + jnp.sqrt(sig2) * jax.scipy.linalg.solve_triangular(
            L.T, z, lower=False
        )
        # λ², ν
        lam2 = _inv_gamma(k2, 1.0, 1.0 / nu + w**2 / (2.0 * tau2 * sig2))
        nu = _inv_gamma(k3, 1.0, 1.0 + 1.0 / lam2)
        # τ², ξ
        tau2 = _inv_gamma(
            k4, 0.5 * (p + 1.0),
            (1.0 / xi + jnp.sum(w**2 / lam2) / (2.0 * sig2))[None],
        )[0]
        xi = _inv_gamma(k5, 1.0, (1.0 + 1.0 / tau2)[None])[0]
        # σ²
        resid = y[:, 0] - Phi @ w
        sig2 = _inv_gamma(
            k6, 0.5 * (n + p),
            (0.5 * jnp.sum(resid**2) + 0.5 * jnp.sum(w**2 / (tau2 * lam2)))[None],
        )[0]
        sig2 = jnp.clip(sig2, 1e-8, 1e6)
        return (w, lam2, tau2, nu, xi, sig2, k), w

    w0 = jnp.zeros(p)
    init = (w0, jnp.ones(p), jnp.asarray(1.0), jnp.ones(p), jnp.asarray(1.0),
            jnp.asarray(1.0), key)
    _, draws = jax.lax.scan(sweep, init, None, length=n_gibbs)
    return draws[n_gibbs // 2 :]


@register_model("lin_reg")
class LinRegModel(BaseModel):
    support_ts = True

    def __init__(self, space, num_out=1, **conf):
        super().__init__(space, num_out, **conf)
        assert num_out == 1
        self.order = conf.get("order", 2)
        self.estimator = conf.get("estimator", "horseshoe")  # mle|bayes|horseshoe
        self.n_gibbs = conf.get("n_gibbs", 300)
        self._seed = conf.get("seed", 0)
        self.w_draws = None
        self.w_mean = None
        self._y_stats = (0.0, 1.0)

    # ------------------------------------------------------------- features
    def _featurize(self, X: np.ndarray) -> np.ndarray:
        """One-hot cats + numerics, then order-2 interaction features."""
        space = self.space
        base = [np.asarray(X, float)[:, space.numeric_dims + space.perm_dims]]
        for c in space.cat_dims:
            n = int(space.num_categories[c])
            oh = np.zeros((len(X), n))
            oh[np.arange(len(X)), np.asarray(X)[:, c].astype(int)] = 1.0
            base.append(oh[:, 1:])  # drop one level (identifiability)
        Z = np.concatenate(base, axis=1)
        feats = [np.ones((len(Z), 1)), Z]
        if self.order >= 2:
            d = Z.shape[1]
            iu = np.triu_indices(d, k=1)
            feats.append(Z[:, iu[0]] * Z[:, iu[1]])
        return np.concatenate(feats, axis=1)

    def fit(self, X, y):
        y = np.asarray(y, float).reshape(len(X), 1)
        ok = np.isfinite(y[:, 0])
        Phi = self._featurize(np.asarray(X)[ok])
        yv = y[ok]
        mu_y, sd_y = float(yv.mean()), max(float(yv.std()), 1e-8)
        self._y_stats = (mu_y, sd_y)
        ys = (yv - mu_y) / sd_y
        n, p = Phi.shape
        if self.estimator == "mle":
            w, *_ = np.linalg.lstsq(Phi, ys[:, 0], rcond=None)
            self.w_mean = w
            self.w_draws = w[None, :]
            self._resid_var = float(np.mean((Phi @ w - ys[:, 0]) ** 2)) + 1e-6
        elif self.estimator == "bayes":
            lam = 1.0
            A = Phi.T @ Phi + lam * np.eye(p)
            w = np.linalg.solve(A, Phi.T @ ys[:, 0])
            resid = ys[:, 0] - Phi @ w
            sig2 = float(np.sum(resid**2) / max(n - 1, 1)) + 1e-6
            cov = sig2 * np.linalg.inv(A)
            rng = np.random.default_rng(self._seed)
            self.w_mean = w
            self.w_draws = rng.multivariate_normal(w, cov, size=32)
            self._resid_var = sig2
        else:  # horseshoe
            key = jax.random.PRNGKey(self._seed)
            draws = _horseshoe_gibbs(
                key, jnp.asarray(Phi, jnp.float32), jnp.asarray(ys, jnp.float32),
                n_gibbs=self.n_gibbs,
            )
            self.w_draws = np.asarray(draws)
            self.w_mean = self.w_draws.mean(axis=0)
            self._resid_var = float(
                np.mean((Phi @ self.w_mean - ys[:, 0]) ** 2)
            ) + 1e-6
        self._seed += 1
        return self

    def predict(self, X):
        Phi = self._featurize(X)
        mu_y, sd_y = self._y_stats
        preds = Phi @ self.w_draws.T  # (n, S)
        mu = preds.mean(axis=1, keepdims=True)
        var = preds.var(axis=1, keepdims=True) + self._resid_var
        return mu * sd_y + mu_y, var * sd_y**2

    # ------------------------------------------------- pure-state protocol
    @property
    def state(self):
        mu_y, sd_y = self._y_stats
        return (
            jnp.asarray(self.w_draws, jnp.float32),
            jnp.float32(self._resid_var),
            jnp.float32(mu_y),
            jnp.float32(sd_y),
        )

    def _featurize_jnp(self, X: jnp.ndarray) -> jnp.ndarray:
        space = self.space
        base = [X[:, list(space.numeric_dims) + list(space.perm_dims)]]
        for c in space.cat_dims:
            n = int(space.num_categories[c])
            base.append(jax.nn.one_hot(X[:, c].astype(jnp.int32), n)[:, 1:])
        Z = jnp.concatenate(base, axis=1)
        feats = [jnp.ones((Z.shape[0], 1), Z.dtype), Z]
        if self.order >= 2:
            d = Z.shape[1]
            iu = np.triu_indices(d, k=1)
            feats.append(Z[:, iu[0]] * Z[:, iu[1]])
        return jnp.concatenate(feats, axis=1)

    def predict_pure(self, state, Xs):
        w_draws, resid_var, mu_y, sd_y = state
        Phi = self._featurize_jnp(Xs)
        preds = Phi @ w_draws.T  # (n, S)
        mu = jnp.mean(preds, axis=1, keepdims=True)
        var = jnp.var(preds, axis=1, keepdims=True) + resid_var
        return mu * sd_y + mu_y, var * sd_y**2

    def joint_sample_pure(self, state, key, Xs):
        """Coefficient-draw Thompson sample (the BOCS acquisition): pick one
        posterior coefficient vector uniformly and evaluate Φ(Xs)·w — a
        coherent function draw, pure in (state, key)."""
        w_draws, resid_var, mu_y, sd_y = state
        i = jax.random.randint(key, (), 0, w_draws.shape[0])
        Phi = self._featurize_jnp(Xs)
        f = Phi @ w_draws[i]
        return f[:, None] * sd_y + mu_y

    def sample_f(self, n_samples: int = 1, seed: int = 0):
        """Thompson sampling: one coefficient draw per sample (BOCS)."""
        idx = [(seed + i) % len(self.w_draws) for i in range(n_samples)]
        W = self.w_draws[idx]
        mu_y, sd_y = self._y_stats

        def f(Xq):
            Phi = self._featurize(np.asarray(Xq))
            return (Phi @ W.T).T[:, :, None] * sd_y + mu_y

        return f

    @property
    def noise(self):
        return np.asarray([self._resid_var * self._y_stats[1] ** 2])
