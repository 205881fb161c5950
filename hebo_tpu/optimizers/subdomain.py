"""Subdomain BO: 1-D line / trust-region BO phases (febo subdomainbo).

Parity: RDUCB/hdbo/febo/algorithms/subdomainbo/ — ``SubDomainBO`` runs BO
restricted to a sequence of low-dimensional subdomains through the
incumbent (subdomainbo.py:46-441):

  * ``CoordinateLineBO`` — lines along coordinate axes, cycled (:397),
  * ``RandomLineBO``     — uniformly random directions (:417),
  * ``AscentLineBO``     — the line along the GP posterior-mean gradient
                           at the incumbent (:428, mean_grad_gp :37),
  * ``mode="tr"``        — a small trust-region box subdomain
                           (subdomain.py TrustRegionDomain).

Each phase fits the global GP on all data, then minimizes LCB inside the
subdomain with the candidate-grid + multi-start L-BFGS solver pair
(febo solvers → hebo_tpu.acq_optimizers.solvers); the phase ends after
``line_steps`` evaluations or when the subdomain's best UCB cannot beat
the incumbent (the reference's ``_line_solver_stop`` criterion :160).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..acquisitions.acq import AcqParams, LCB
from ..acq_optimizers.solvers import grid_solver, multi_start_lbfgs
from ..models import get_model
from .base import AbstractOptimizer

__all__ = ["SubDomainBO", "CoordinateLineBO", "RandomLineBO", "AscentLineBO"]


class SubDomainBO(AbstractOptimizer):
    support_parallel_opt = False

    def __init__(
        self,
        space,
        mode: str = "coordinate",  # coordinate | random | ascent | tr
        n_init: Optional[int] = None,
        line_steps: int = 5,
        tr_radius: float = 0.2,
        kappa: float = 2.0,
        model_config: Optional[dict] = None,
        csv_save_path: Optional[str] = None,
        seed: int = 0,
    ):
        super().__init__(space, csv_save_path)
        assert not space.cat_dims, "subdomain BO is continuous-only (febo)"
        self.mode = mode
        self.n_init = n_init if n_init is not None else 1 + space.num_cols
        self.line_steps = line_steps
        self.tr_radius = tr_radius
        self.kappa = kappa
        self.model_config = {"num_epochs": 30, "n_restarts": 1, **(model_config or {})}
        self.rng = np.random.default_rng(seed)
        self._sobol_count = 0
        self._phase_left = 0
        self._direction: Optional[np.ndarray] = None
        self._coord = 0
        self.model = None

    # ------------------------------------------------------------- helpers
    def _lbfgs_eval_fns(self):
        """Stable (f_box, f_line) closures for multi_start_lbfgs.

        Memoized per model identity so the jitted L-BFGS program (which
        keys its trace cache on the callable) is compiled once and reused
        across every refit — model state travels through ``args``."""
        cache = getattr(self, "_lbfgs_cache", None)
        if cache is not None and cache[0] is self.model:
            return cache[1], cache[2]
        model = self.model
        acq = LCB()

        def f_box(args, Xc):
            st, pr = args
            return acq.eval_pure(model, st, pr, Xc)

        def f_line(args, T):  # T (B, 1) line parameter
            st, pr, x0, d = args
            Xc = x0[None, :] + T * d[None, :]
            return acq.eval_pure(model, st, pr, Xc)

        self._lbfgs_cache = (model, f_box, f_line)
        return f_box, f_line

    def _lb_ub(self):
        return self.space.opt_lb.astype(float), self.space.opt_ub.astype(float)

    def _fit(self, Xv, yv):
        if self.model is None:
            self.model = get_model("gp", self.space, num_out=1, **self.model_config)
        ys = (yv - yv.mean()) / max(yv.std(), 1e-12)
        self.model.fit(Xv, ys.reshape(-1, 1))
        return ys

    def _new_direction(self, x0, Xv, ys):
        D = self.space.num_cols
        if self.mode == "coordinate":
            d = np.zeros(D)
            d[self._coord % D] = 1.0
            self._coord += 1
            return d
        if self.mode == "random":
            d = self.rng.standard_normal(D)
            return d / np.linalg.norm(d)
        if self.mode == "ascent":
            # GP posterior-mean gradient at the incumbent (mean_grad_gp)
            state = self.model.state

            def mean_at(x):
                mu, _ = self.model.predict_pure(state, x[None, :])
                return mu[0, 0]

            g = np.asarray(jax.grad(mean_at)(jnp.asarray(x0, jnp.float32)))
            n = np.linalg.norm(g)
            if not np.isfinite(n) or n < 1e-9:
                g = self.rng.standard_normal(D)
                n = np.linalg.norm(g)
            return -g / n  # descent direction (we minimize)
        raise ValueError(self.mode)

    # ------------------------------------------------------------- suggest
    def method_suggest(self, n_suggestions=1, fix_input=None):
        assert n_suggestions == 1, "subdomain BO is strictly sequential"
        if self.num_obs < self.n_init:
            X = self.space.sobol_sample_opt(1, seed=self._sobol_count)
            self._sobol_count += 1
            return self.space.inverse_transform(X)

        X = self.space.transform(self.X).astype(np.float32)
        y = self.y[:, 0]
        ok = np.isfinite(y)
        Xv, yv = X[ok], y[ok]
        ys = self._fit(Xv, yv)
        best = int(np.argmin(ys))
        x0 = Xv[best].astype(float)
        tau = float(ys[best])

        lb, ub = self._lb_ub()
        state = self.model.state
        acq = LCB()
        params = AcqParams(kappa=jnp.float32(self.kappa), tau=jnp.float32(tau))
        f_box, f_line = self._lbfgs_eval_fns()

        def acq_f(Xc):
            return acq.eval_pure(self.model, state, params, jnp.asarray(Xc, jnp.float32))

        if self.mode == "tr":
            # small box subdomain around the incumbent
            span = (ub - lb) * self.tr_radius
            tlb = np.maximum(lb, x0 - span / 2)
            tub = np.minimum(ub, x0 + span / 2)
            x_grid, _ = grid_solver(
                lambda Z: np.asarray(acq_f(Z)),
                tlb, tub,
                points_per_dim=max(3, int(round(200 ** (1 / len(lb))))),
            )
            X0 = np.vstack([
                x_grid,
                self.rng.uniform(tlb, tub, (7, len(lb))),
            ])
            x_best, _ = multi_start_lbfgs(
                f_box, X0, tlb, tub, n_iters=20, args=(state, params)
            )
            return self.space.inverse_transform(x_best[None, :])

        # ------- line modes: 1-D subdomain through the incumbent --------
        if self._phase_left <= 0 or self._direction is None:
            self._direction = self._new_direction(x0, Xv, ys)
            self._phase_left = self.line_steps
        self._phase_left -= 1
        d = self._direction

        # parametrize x = x0 + t d, t in [t_lo, t_hi] staying in the box
        with np.errstate(divide="ignore", invalid="ignore"):
            t_upper = np.where(d > 0, (ub - x0) / d, np.where(d < 0, (lb - x0) / d, np.inf))
            t_lower = np.where(d > 0, (lb - x0) / d, np.where(d < 0, (ub - x0) / d, -np.inf))
        t_hi = float(np.min(t_upper))
        t_lo = float(np.max(t_lower))

        ts = np.linspace(t_lo, t_hi, 128)
        cands = x0[None, :] + ts[:, None] * d[None, :]
        vals = np.asarray(acq_f(cands))[:, 0]
        i = int(np.argmin(vals))
        # L-BFGS refinement in t around the grid best
        t_starts = np.clip(
            ts[i] + np.asarray([-0.02, 0.0, 0.02]) * (t_hi - t_lo), t_lo, t_hi
        )

        t_best, v_best = multi_start_lbfgs(
            f_line, t_starts[:, None], np.asarray([t_lo]), np.asarray([t_hi]),
            n_iters=15,
            args=(
                state, params,
                jnp.asarray(x0, jnp.float32), jnp.asarray(d, jnp.float32),
            ),
        )
        x_new = np.clip(x0 + float(t_best[0]) * d, lb, ub)

        # stop criterion: line's best UCB cannot beat the incumbent mean
        mu, var = self.model.predict(cands[i : i + 1].astype(np.float32))
        if float(mu[0, 0] - self.kappa * math.sqrt(max(var[0, 0], 0.0))) > tau:
            self._phase_left = 0  # give up on this line next iteration

        return self.space.inverse_transform(x_new[None, :])


def CoordinateLineBO(space, **kw):
    """febo CoordinateLineBO (subdomainbo.py:397)."""
    return SubDomainBO(space, mode="coordinate", **kw)


def RandomLineBO(space, **kw):
    """febo RandomLineBO (subdomainbo.py:417)."""
    return SubDomainBO(space, mode="random", **kw)


def AscentLineBO(space, **kw):
    """febo AscentLineBO (subdomainbo.py:428)."""
    return SubDomainBO(space, mode="ascent", **kw)
