"""Compositional acquisition maximization (CompBO).

Parity: CompBO (/root/reference/CompBO/, 3,210 LoC): Monte-Carlo
acquisition functions rewritten in nested-expectation form
(core/comp_acquisition/{compositional,mc_compositional,mc_fs}_
acquisition.py) maximized with compositional stochastic optimizers
``CAdam`` / ``NASA`` / ``SCGD`` / ``ASCGD`` / Adam-OS
(custom_optimizer/*.py).

The compositional problem:  max_x  g( E_w[ h(x, w) ] )  where the inner
expectation is over posterior draws.  For q-EI:  h(x, w) = τ - f_w(x)
componentwise, g(u) = E[max(u, 0)] — the optimizers track a running
estimate y_t ≈ E_w[h] and ascend g(y_t) with two time scales.

TPU-native: each optimizer is a jitted lax.scan; posterior draws are
reparametrized through the GP predictive (μ + σ·ε with common random
numbers), so gradients flow end-to-end through the device program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mcbo_opts import AcqOptimizerBase

__all__ = ["CompositionalAcqOptimizer"]


def _posterior_draw(model, state, X, eps):
    """Reparametrized joint draws at X: (S, P) via μ + σ ε."""
    mu, var = model.predict_pure(state, X)
    sigma = jnp.sqrt(jnp.maximum(var, 1e-12))
    return mu[None, :, 0] + eps * sigma[None, :, 0]


class CompositionalAcqOptimizer(AcqOptimizerBase):
    """Maximize MC q-EI (negated → minimized) with a compositional
    stochastic optimizer over the continuous opt-frame box."""

    def __init__(
        self,
        space,
        method: str = "cadam",  # cadam | scgd | ascgd | nasa | adam
        n_steps: int = 64,
        n_starts: int = 16,
        n_mc: int = 32,
        lr: float = 0.05,
        inner_lr: float = 0.5,
        **kw,
    ):
        super().__init__(space, **kw)
        assert method in ("cadam", "scgd", "ascgd", "nasa", "adam")
        self.method = method
        self.n_steps = n_steps
        self.n_starts = n_starts
        self.n_mc = n_mc
        self.lr = lr
        self.inner_lr = inner_lr
        self._run_cache = {}

    def _build_run(self, model):
        ck = id(model)
        if ck in self._run_cache:
            return self._run_cache[ck]
        method, n_steps, n_mc = self.method, self.n_steps, self.n_mc
        lr, beta_in = self.lr, self.inner_lr
        lb = jnp.asarray(self.space.opt_lb, jnp.float32)
        ub = jnp.asarray(self.space.opt_ub, jnp.float32)

        def inner_h(state, X, tau, eps):
            # h(x, w) = τ - f_w(x): (S, P)
            return tau - _posterior_draw(model, state, X, eps)

        def outer_g(u):
            # smoothed max(u, 0), mean over draws → per-point qEI estimate
            return jnp.mean(jax.nn.softplus(u * 12.0) / 12.0, axis=0)

        @jax.jit
        def run(key, state, tau, X0):
            P = X0.shape[0]

            def qei(X, k):
                eps = jax.random.normal(k, (n_mc, P))
                return -jnp.sum(outer_g(inner_h(state, X, tau, eps)))

            if method == "adam":  # Adam-OS baseline: plain MC gradient
                import optax

                opt = optax.adam(lr)

                def step(carry, i):
                    X, st, k = carry
                    k, ks = jax.random.split(k)
                    g = jax.grad(qei)(X, ks)
                    up, st = opt.update(g, st, X)
                    X = jnp.clip(X + up, lb, ub)
                    return (X, st, k), None

                (Xf, _, _), _ = jax.lax.scan(
                    step, (X0, opt.init(X0), key), jnp.arange(n_steps)
                )
            else:
                # compositional: track y ≈ E_w[h(x, w)]  (S-free, per point)
                def h_mean(X, k):
                    eps = jax.random.normal(k, (n_mc, P))
                    return jnp.mean(inner_h(state, X, tau, eps), axis=0)

                def outer_loss(y):
                    return -jnp.sum(jax.nn.softplus(y * 12.0) / 12.0)

                def step(carry, i):
                    X, y, m, v, k = carry
                    k, k1, k2 = jax.random.split(k, 3)
                    # two-timescale tracking of the inner expectation
                    beta_t = jnp.where(
                        jnp.asarray(method == "scgd"),
                        beta_in / jnp.sqrt(i + 1.0),
                        beta_in,
                    )
                    y = (1.0 - beta_t) * y + beta_t * h_mean(X, k1)
                    # chain rule: dL/dx = (dh/dx)^T · dg/dy evaluated at y
                    gy = jax.grad(outer_loss)(y)
                    _, vjp = jax.vjp(lambda Xi: h_mean(Xi, k2), X)
                    (gx,) = vjp(gy)
                    if method in ("cadam", "nasa"):
                        m = 0.9 * m + 0.1 * gx
                        v = 0.999 * v + 0.001 * gx**2
                        upd = lr * m / (jnp.sqrt(v) + 1e-8)
                    else:  # scgd / ascgd: (accelerated) SGD outer step
                        a = jnp.where(
                            jnp.asarray(method == "ascgd"),
                            lr / jnp.sqrt(i + 1.0) * 2.0,
                            lr / jnp.sqrt(i + 1.0),
                        )
                        upd = a * gx
                    X = jnp.clip(X - upd, lb, ub)
                    return (X, y, m, v, k), None

                y0 = h_mean(X0, key)
                (Xf, *_,), _ = jax.lax.scan(
                    step,
                    (X0, y0, jnp.zeros_like(X0), jnp.zeros_like(X0), key),
                    jnp.arange(n_steps),
                )
            k_final = jax.random.fold_in(key, 7)
            eps = jax.random.normal(k_final, (n_mc, P))
            score = -outer_g(inner_h(state, Xf, tau, eps))
            return Xf, score

        self._run_cache[ck] = run
        return run

    def optimize(self, model, acq, acq_params, n_suggestions=1, x_observed=None,
                 tr_manager=None, seed=0):
        tr = self._tr(tr_manager)
        X0 = self._sample(tr, self.n_starts, seed).astype(np.float32)
        run = self._build_run(model)
        Xf, score = run(
            jax.random.PRNGKey(seed),
            model.state,
            jnp.float32(float(acq_params.tau)),
            jnp.asarray(X0),
        )
        Xf = self.space.round_opt(np.asarray(Xf))
        return self._top_unique(Xf, np.asarray(score), n_suggestions, x_observed)
