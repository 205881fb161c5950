"""SafeOpt: Bayesian optimization with high-probability safety constraints.

Parity: the febo framework vendored in RDUCB ships a SafeOpt solver and
subdomain-BO machinery (RDUCB/hdbo/febo/ — SURVEY.md §2.3 "febo vendored
(LineBO framework: solvers incl. multi_lbfgs, subdomain BO, safeopt)").
This is the classic Sui et al. (2015) candidate-set formulation:

  * safe set      S = {x : ucb_g(x) ≤ h}   (we MINIMIZE y; the safety
    condition is "y stays below the threshold h with high confidence"),
  * minimizers    M = {x ∈ S : lcb(x) ≤ min_{x'∈S} ucb(x')},
  * expanders     G = boundary points of S whose optimistic value could
    certify new safe points,
  * acquisition   argmax over M ∪ G of the confidence width (2βσ).

TPU-native shape discipline: the candidate set is a FIXED-size scrambled-
Sobol grid, so every per-iteration computation (posterior over candidates,
set memberships, argmax) is a fixed-shape masked tensor program — no
data-dependent shapes, one compile.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..models import get_model
from .base import AbstractOptimizer

__all__ = ["SafeOpt"]


class SafeOpt(AbstractOptimizer):
    """Ask/tell safe BO.  ``observe`` y is both objective and safety signal
    (separate safety observations via ``observe_safety``)."""

    def __init__(
        self,
        space,
        safety_threshold: float,
        beta: float = 2.0,
        lipschitz: Optional[float] = None,
        n_candidates: int = 1024,
        expander_quantile: float = 0.75,
        model_config: Optional[dict] = None,
        seed: int = 0,
        csv_save_path: Optional[str] = None,
    ):
        super().__init__(space, csv_save_path)
        self.h = float(safety_threshold)
        self.beta = beta
        # Sui et al. (2015) safety certification is Lipschitz-based: a point
        # is safe only if some observed safe point certifies it within the
        # Lipschitz cone.  A GP-only ucb check is overconfident far from
        # data (the posterior reverts to the data mean).  None = estimate
        # from observed finite-difference slopes each iteration.
        self.lipschitz = lipschitz
        self.model_config = model_config or {"num_epochs": 30}
        self.model = None
        # static candidate grid (fixed shapes → one compiled posterior)
        self._cands = space.sobol_sample_opt(n_candidates, seed=seed)
        self._expander_quantile = expander_quantile
        self._rng = np.random.default_rng(seed)

    def method_suggest(self, n_suggestions=1, fix_input=None):
        assert fix_input is None, "SafeOpt does not support fix_input"
        X = self.space.transform(self.X) if self.num_obs else None
        if self.num_obs == 0:
            raise RuntimeError(
                "SafeOpt needs at least one observed SAFE point; observe an "
                "initial safe seed before suggesting"
            )
        y = self.y[:, :1]
        ok = np.isfinite(y[:, 0])
        Xv, yv = X[ok], y[ok]
        if not np.any(yv[:, 0] <= self.h):
            raise RuntimeError(
                f"no observed point satisfies the safety threshold {self.h}"
            )
        # fit on RAW y (the GP standardizes internally and predicts in the
        # raw frame): standardizing here with the tiny early-iteration std
        # would inflate the threshold and mark everything "safe"
        if self.model is None:
            self.model = get_model("gp", self.space, num_out=1, **self.model_config)
        self.model.fit(Xv, yv)

        mu, var = self.model.predict(self._cands)
        sd = np.sqrt(np.maximum(var[:, 0], 1e-12))
        lcb = mu[:, 0] - self.beta * sd
        ucb = mu[:, 0] + self.beta * sd

        # Lipschitz certification from observed safe points
        L = self.lipschitz
        if L is None:
            dx = np.linalg.norm(Xv[:, None] - Xv[None, :], axis=-1)
            dy = np.abs(yv[:, 0][:, None] - yv[:, 0][None, :])
            iu = np.triu_indices(len(Xv), k=1)
            ok_pair = dx[iu] > 1e-6
            if np.any(ok_pair):
                L = 1.5 * float(np.max(dy[iu][ok_pair] / dx[iu][ok_pair]))
            else:
                # no slope information yet: explore a small ball around the
                # safe incumbent instead of trusting the GP far afield
                best = Xv[np.argmin(yv[:, 0])]
                span = (self.space.opt_ub - self.space.opt_lb) * 0.05
                picks = [
                    self.space.round_opt(
                        np.clip(
                            best + self._rng.uniform(-1, 1, best.shape) * span,
                            self.space.opt_lb, self.space.opt_ub,
                        )
                    )
                    for _ in range(n_suggestions)
                ]
                return self.space.inverse_transform(np.stack(picks))
        safe_obs = yv[:, 0] <= self.h
        d_to_safe = np.linalg.norm(
            self._cands[:, None, :] - Xv[None, safe_obs, :], axis=-1
        )
        cert = np.min(yv[safe_obs, 0][None, :] + L * d_to_safe, axis=1) <= self.h
        safe = (ucb <= self.h) & cert  # GP confidence AND Lipschitz cone
        picks = []
        for _ in range(n_suggestions):
            if not np.any(safe):
                # fall back to the safest observed point's neighborhood:
                # re-suggest the best observed safe point (pure exploitation)
                best = Xv[np.argmin(yv[:, 0])]
                picks.append(best)
                continue
            ucb_s = np.where(safe, ucb, np.inf)
            lcb_s = np.where(safe, lcb, np.inf)
            # potential minimizers
            minimizers = safe & (lcb_s <= np.min(ucb_s))
            # expanders: safe points with large uncertainty (optimistic
            # boundary growth proxy — febo's safeopt uses per-constraint
            # expansion checks; width is the standard practical surrogate)
            w = 2.0 * self.beta * sd
            thresh = np.quantile(w[safe], self._expander_quantile)
            expanders = safe & (w >= thresh)
            cand_set = minimizers | expanders
            scores = np.where(cand_set, w, -np.inf)
            idx = int(np.argmax(scores))
            picks.append(self._cands[idx])
            safe = safe.copy()
            safe[idx] = False  # don't repeat within the batch
        return self.space.inverse_transform(np.stack(picks))

    @property
    def safe_incumbent(self):
        """Best observed point that satisfies the safety threshold."""
        y = self.y[:, 0]
        ok = np.isfinite(y) & (y <= self.h)
        if not np.any(ok):
            return None
        i = np.flatnonzero(ok)[np.argmin(y[ok])]
        return self.X.iloc[[i]], y[i]
