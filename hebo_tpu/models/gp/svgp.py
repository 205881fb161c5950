"""Sparse GP surrogate (collapsed variational / Titsias bound).

Parity: reference ``SVGP`` (HEBO/hebo/models/gp/svgp.py:30-251) — an
inducing-point sparse variational GP (Cholesky variational distribution,
minibatch ELBO).  On TPU the dataset is modest and fully device-resident,
so the *collapsed* bound (SGPR: the optimal variational distribution in
closed form) is both tighter and cheaper — O(N M²) dense matmuls that map
straight onto the MXU; inducing locations and kernel hyperparameters are
optimized jointly by Adam in one jitted scan.

Also covers ``SVIDKL`` capability (deep-kernel feature extractor ahead of
the kernel — reference svidkl.py:55) via the shared categorical-embedding
feature path.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.chol import chol_logdet, chol_solve, safe_cholesky
from ..base import BaseModel, register_model
from .gp import GP, GPCore, GPData, GPParams

__all__ = ["SVGP", "SVGPParams"]


class SVGPParams(NamedTuple):
    gp: GPParams
    Z: jnp.ndarray  # (M, D_feat) inducing locations in feature space


class SVGPCore(GPCore):
    def __init__(self, *args, num_inducing: int = 32, **kw):
        super().__init__(*args, **kw)
        self.num_inducing = num_inducing

    # --------------------------------------------------------------- elbo
    def neg_elbo(self, params: SVGPParams, data: GPData) -> jnp.ndarray:
        core_p = params.gp
        f = self.features(core_p, data.X, data)
        m = data.mask.astype(f.dtype)
        noise = jnp.exp(core_p.log_noise) + self.noise_lb
        M = params.Z.shape[0]

        Kmm = self.gram(core_p, params.Z, params.Z) + 1e-5 * jnp.eye(M, dtype=f.dtype)
        Kmn = self.gram(core_p, params.Z, f) * m[None, :]
        Lm, _ = safe_cholesky(Kmm)
        A = jax.scipy.linalg.solve_triangular(Lm, Kmn, lower=True)  # (M, N)
        B = jnp.eye(M, dtype=f.dtype) + (A @ A.T) / noise
        Lb, _ = safe_cholesky(B)
        r = (data.y - core_p.mean) * m[:, None]
        c = jax.scipy.linalg.solve_triangular(Lb, A @ r, lower=True) / noise
        n_act = jnp.sum(m)
        # log|Qnn + σ²I| = log|B| + n log σ²
        logdet = chol_logdet(Lb) + n_act * jnp.log(noise)
        quad = (jnp.sum(r * r) / noise) - jnp.sum(c * c) / noise
        # trace correction: Σ_i k(x_i, x_i) - q(x_i, x_i), masked
        kss = jnp.exp(core_p.log_sc) * n_act
        qnn = jnp.sum((A * A) * m[None, :])
        trace = (kss - qnn) / noise
        elbo = -0.5 * (quad + logdet + n_act * math.log(2 * math.pi)) - 0.5 * trace
        return -elbo

    def loss(self, params: SVGPParams, data: GPData) -> jnp.ndarray:
        return self.neg_elbo(params, data) - self.log_prior(params.gp)

    # ---------------------------------------------------------- posterior
    def svgp_cache(self, params: SVGPParams, data: GPData):
        core_p = params.gp
        f = self.features(core_p, data.X, data)
        m = data.mask.astype(f.dtype)
        noise = jnp.exp(core_p.log_noise) + self.noise_lb
        M = params.Z.shape[0]
        Kmm = self.gram(core_p, params.Z, params.Z) + 1e-5 * jnp.eye(M, dtype=f.dtype)
        Kmn = self.gram(core_p, params.Z, f) * m[None, :]
        Lm, _ = safe_cholesky(Kmm)
        Amat = Kmm + (Kmn @ Kmn.T) / noise
        La, _ = safe_cholesky(Amat)
        r = (data.y - core_p.mean) * m[:, None]
        w = chol_solve(La, Kmn @ r) / noise  # (M, 1)
        return (Lm, La, w)

    def svgp_predict(self, params: SVGPParams, cache, data: GPData, Xs):
        core_p = params.gp
        Lm, La, w = cache
        fs = self.features(core_p, Xs, data)
        Ks = self.gram(core_p, params.Z, fs)  # (M, P)
        mu = core_p.mean + Ks.T @ w
        v1 = jax.scipy.linalg.solve_triangular(Lm, Ks, lower=True)
        v2 = jax.scipy.linalg.solve_triangular(La, Ks, lower=True)
        kss = jnp.exp(core_p.log_sc)
        var = kss - jnp.sum(v1 * v1, axis=0) + jnp.sum(v2 * v2, axis=0)
        return mu, jnp.maximum(var, 1e-10)[:, None]


@register_model("svgp")
class SVGP(GP):
    """Host wrapper: same bucket/caching scheme as the exact GP."""

    def __init__(self, space, num_out: int = 1, **conf):
        super().__init__(space, num_out=num_out, **conf)
        num_cats = [int(space.num_categories[c]) for c in space.cat_dims]
        self.core = SVGPCore(
            numeric_dims=tuple(space.numeric_dims) + tuple(space.perm_dims),
            cat_dims=tuple(space.cat_dims),
            num_categories=tuple(num_cats),
            kernel=conf.get("kernel", "matern32"),
            optimizer="adam",
            n_steps=conf.get("num_epochs", 150),
            lr=conf.get("lr", 0.03),
            num_inducing=conf.get("num_inducing", 32),
        )
        self._fit_jit = {}
        self._pred_jit = {}

    def _get_fit_fn(self, n_pad):
        if n_pad not in self._fit_jit:
            core = self.core
            import optax

            opt = optax.adam(core.lr)

            @jax.jit
            def fit_fn(key, data: GPData):
                k1, k2 = jax.random.split(key)
                gp0 = core.init_params(k1, data)
                f = core.features(gp0, data.X, data)
                # init inducing at random (masked) data features + jitter
                idx = jax.random.randint(
                    k2, (core.num_inducing,), 0, data.X.shape[0]
                )
                Z0 = f[idx] + 0.01 * jax.random.normal(
                    k2, (core.num_inducing, f.shape[1]), f.dtype
                )
                p0 = SVGPParams(gp=gp0, Z=Z0)
                st = opt.init(p0)

                def step(carry, _):
                    p, s = carry
                    g = jax.grad(core.loss)(p, data)
                    g = jax.tree.map(lambda t: jnp.clip(t, -1e3, 1e3), g)
                    up, s = opt.update(g, s, p)
                    p = jax.tree.map(lambda a, b: a + b, p, up)
                    return (p, s), None

                (pf, _), _ = jax.lax.scan(step, (p0, st), None, length=core.n_steps)
                cache = core.svgp_cache(pf, data)
                return pf, cache

            self._fit_jit[n_pad] = fit_fn
        return self._fit_jit[n_pad]

    def fit(self, X, y):
        from ...utils.dtypes import pad_bucket
        from .gp import _make_data

        n = len(X)
        n_pad = pad_bucket(max(n, 2))
        self.data = _make_data(X, y, self.core.numeric_dims, n_pad)
        key = jax.random.PRNGKey(self._seed)
        self._seed += 1
        self.params, self._cache = self._get_fit_fn(n_pad)(key, self.data)
        return self

    def predict(self, X):
        from ...utils.dtypes import pad_bucket

        X = np.asarray(X, dtype=np.float32)
        p = len(X)
        p_pad = pad_bucket(p)
        Xp = np.zeros((p_pad, X.shape[1]), np.float32)
        Xp[:p] = X
        k = (self.data.X.shape[0], p_pad)
        if k not in self._pred_jit:
            core = self.core

            @jax.jit
            def pred_fn(params, cache, data, Xs):
                return core.svgp_predict(params, cache, data, Xs)

            self._pred_jit[k] = pred_fn
        mu, var = self._pred_jit[k](self.params, self._cache, self.data, jnp.asarray(Xp))
        ys, ym = float(self.data.y_std), float(self.data.y_mean)
        return np.asarray(mu)[:p] * ys + ym, np.asarray(var)[:p] * ys**2

    @property
    def state(self):
        return (self.params, self._cache, self.data)

    def predict_pure(self, state, Xs):
        params, cache, data = state
        mu, var = self.core.svgp_predict(params, cache, data, Xs)
        return mu * data.y_std + data.y_mean, var * data.y_std**2

    @property
    def noise(self):
        ys = float(self.data.y_std)
        return np.asarray(
            [float(jnp.exp(self.params.gp.log_noise) + self.core.noise_lb) * ys**2]
        )
