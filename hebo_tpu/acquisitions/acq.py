"""Acquisition functions as pure, vmappable jnp programs.

Parity: reference acquisition module (HEBO/hebo/acquisitions/acq.py):
``Acquisition`` ABC with the (N, num_obj + num_constr) *minimization*
convention (:17-39), ``LCB``/``Mean``/``Sigma`` (:56-75), ``MACE`` with the
numerically-stable log-EI / log-PI asymptotic switch (:131-171),
``MOMeanSigmaLCB`` (:99-129), ``NoisyAcq`` (:173-190) and ``GeneralAcq``
(:192-242) — plus the single-objective EI/PI/UCB/Thompson family MCBO keeps
in acq_funcs/ (ei.py:6-40, thompson_sampling.py:5-16).

Design: an acquisition is a *static* object; its ``eval_pure(model, state,
params, X)`` method is a pure function of the model-state pytree, an
``AcqParams`` pytree (kappa, tau, PRNG key, ...) and the candidate batch
``X (P, D)`` — so the whole NSGA-II acquisition-optimization loop jits as
one device program with the model state as an argument (no retrace per BO
iteration).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

__all__ = [
    "AcqParams",
    "Acquisition",
    "LCB",
    "Mean",
    "Sigma",
    "EI",
    "PI",
    "UCB",
    "MACE",
    "ThompsonSampling",
    "CEI",
    "AddLCB",
    "MOMeanSigmaLCB",
    "GeneralAcq",
    "log_ei",
    "log_pi",
]


class AcqParams(NamedTuple):
    """Dynamic per-iteration acquisition inputs."""

    tau: jnp.ndarray = jnp.float32(0.0)  # incumbent (best) objective value
    kappa: jnp.ndarray = jnp.float32(2.0)  # LCB exploration weight
    eps: jnp.ndarray = jnp.float32(1e-4)  # EI/PI improvement slack
    key: Optional[jax.Array] = None  # PRNG for noise-perturbed mean
    noise: jnp.ndarray = jnp.float32(0.0)  # obs-noise scale for perturbation


def log_pi(normed: jnp.ndarray) -> jnp.ndarray:
    """log P(improvement): logΦ(z) — jax's logcdf is stable to z ≪ 0."""
    return norm.logcdf(normed)


def log_ei(normed: jnp.ndarray, log_sigma: jnp.ndarray) -> jnp.ndarray:
    """log EI with the reference's asymptotic switch (acq.py:146-171).

    EI = σ·(z·Φ(z) + φ(z)), z = (τ - μ)/σ.  For z ≤ -6 the direct form
    underflows in f32; the Mills-ratio asymptotic gives
    log EI ≈ log φ(z) - log(z² - 1) + log σ.
    """
    z = normed
    direct = jnp.log(
        jnp.maximum(z * norm.cdf(z) + jnp.exp(norm.logpdf(z)), 1e-38)
    )
    asymptotic = norm.logpdf(z) - jnp.log(jnp.maximum(z * z - 1.0, 1.0))
    return jnp.where(z > -6.0, direct, asymptotic) + log_sigma


class Acquisition:
    """Static acquisition config.  Subclasses implement ``eval_pure``."""

    num_obj: int = 1
    num_constr: int = 0

    @property
    def num_out(self) -> int:
        return self.num_obj + self.num_constr

    def eval_pure(self, model, state, params: AcqParams, X: jnp.ndarray) -> jnp.ndarray:
        """→ (P, num_obj + num_constr), minimization convention."""
        raise NotImplementedError

    def __call__(self, model, X, params: Optional[AcqParams] = None):
        """Host-convenience eager evaluation on a fitted model wrapper."""
        import numpy as np

        params = params if params is not None else AcqParams()
        out = self.eval_pure(model, model.state, params, jnp.asarray(X, jnp.float32))
        return np.asarray(out)


def _predict(model, state, X):
    """(mu, sigma) from the model's pure predict."""
    mu, var = model.predict_pure(state, X)
    return mu, jnp.sqrt(jnp.maximum(var, 1e-12))


class LCB(Acquisition):
    """μ - κσ (reference acq.py:56)."""

    def __init__(self, kappa: float = 2.0):
        self.kappa = kappa

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)
        return mu - params.kappa * sigma


class Mean(Acquisition):
    def eval_pure(self, model, state, params, X):
        mu, _ = _predict(model, state, X)
        return mu


class Sigma(Acquisition):
    """-σ: minimizing it maximizes predictive uncertainty (acq.py:75)."""

    def eval_pure(self, model, state, params, X):
        _, sigma = _predict(model, state, X)
        return -sigma


class EI(Acquisition):
    """Negated log-EI (minimized)."""

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)
        normed = (params.tau - params.eps - mu) / sigma
        return -log_ei(normed, jnp.log(sigma))


class PI(Acquisition):
    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)
        normed = (params.tau - params.eps - mu) / sigma
        return -log_pi(normed)


class UCB(Acquisition):
    """Alias of LCB under the minimization convention."""

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)
        return mu - params.kappa * sigma


class MACE(Acquisition):
    """The HEBO acquisition: 3-objective min of (LCB, -logEI, -logPI).

    Parity: reference ``MACE`` (acq.py:131-171) including the
    noise-perturbed mean (``y += sqrt(2)·noise·randn``) and the log-space
    asymptotic approximations.
    """

    num_obj = 3

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)
        if params.key is not None:
            jitter = (
                math.sqrt(2.0)
                * params.noise
                * jax.random.normal(params.key, mu.shape, mu.dtype)
            )
            mu = mu + jitter
        lcb = mu - params.kappa * sigma
        normed = (params.tau - params.eps - mu) / sigma
        lei = log_ei(normed, jnp.log(sigma))
        lpi = log_pi(normed)
        return jnp.concatenate([lcb, -lei, -lpi], axis=-1)


class ThompsonSampling(Acquisition):
    """Faithful Thompson sampling: one coherent joint-posterior function
    draw per call (MCBO thompson_sampling.py:5-16 evaluates
    ``model.sample_y(x, n_samples=1)`` — a joint MVN draw over the
    candidate batch; BOCS draws a coefficient vector).

    Models exposing ``joint_sample_pure(state, key, X)`` (GP: MVN draw
    from the cached posterior; LinReg: coefficient draw) get the exact
    semantics inside the jitted acquisition loop; models without it fall
    back to the randomized confidence bound μ + ε·σ with one shared ε."""

    def eval_pure(self, model, state, params, X):
        key = params.key if params.key is not None else jax.random.PRNGKey(0)
        if hasattr(model, "joint_sample_pure"):
            return model.joint_sample_pure(state, key, X)
        mu, sigma = _predict(model, state, X)
        eps = jax.random.normal(key, (1, 1), mu.dtype)
        return mu + eps * sigma


class CEI(Acquisition):
    """Constrained EI: maximize  Pr(c_i(x) ≤ λ_i) · EI(x)  (Gardner et al.).

    Parity: MCBO ``CEI`` (mcbo/acq_funcs/cei.py) — there the objective and
    each constraint are separate models; here the model is multi-output
    (``MultiTaskModel`` or any ``num_out = 1 + num_constr`` surrogate):
    output 0 is the objective, outputs 1..k the constraints.  ``lambdas``
    are thresholds in the raw output space.  Evaluated in log space
    (−logEI − Σ logΦ((λ_i − μ_i)/σ_i)) so it composes with the NSGA-II /
    local-search loops without underflow; a non-finite ``params.tau``
    switches to pure feasibility maximization (the reference's
    ``best_y=None`` branch).
    """

    def __init__(self, num_constr: int = 0, lambdas=None, augmented_ei: bool = False):
        self.num_constr = 0  # exposed as a single minimization column
        self._n_constr = int(num_constr)
        lam = [0.0] * self._n_constr if lambdas is None else list(lambdas)
        self.lambdas = jnp.asarray(lam, jnp.float32)
        self.augmented_ei = augmented_ei

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)  # (P, 1 + n_constr)
        mu0, s0 = mu[:, :1], sigma[:, :1]
        normed = (params.tau - params.eps - mu0) / s0
        lei = log_ei(normed, jnp.log(s0))
        if self.augmented_ei:
            # EI · (1 − σ_n / sqrt(σ² + σ_n²))  (MCBO ei.py:6-40)
            sn = params.noise
            lei = lei + jnp.log(
                jnp.maximum(1.0 - sn / jnp.sqrt(s0**2 + sn**2 + 1e-12), 1e-12)
            )
        if self._n_constr:
            mc = mu[:, 1 : 1 + self._n_constr]
            sc = sigma[:, 1 : 1 + self._n_constr]
            lfeas = jnp.sum(
                norm.logcdf((self.lambdas[None, :] - mc) / sc),
                axis=-1, keepdims=True,
            )
        else:
            lfeas = jnp.zeros_like(lei)
        # best_y=None analogue: non-finite tau → optimize feasibility only
        score = jnp.where(jnp.isfinite(params.tau), -(lei + lfeas), -lfeas)
        return score


class AddLCB(Acquisition):
    """Additive LCB over a random decomposition: Σ_c (μ_c − β σ_c).

    Parity: MCBO ``AddLCB`` (mcbo/acq_funcs/additive_lcb.py:17) — the
    standalone acq_func_id form, summing per-clique posterior LCBs of a
    ``RandDecompositionGP``.  Requires a model exposing the clique
    interface (``core.cliques`` + ``core.predict_clique``); kappa comes
    from ``params.kappa`` (reference default β = 1.96)."""

    def eval_pure(self, model, state, params, X):
        samples, caches, data = state
        core = model.core
        total = jnp.zeros((X.shape[0], 1), jnp.float32)
        for c in range(len(core.cliques)):
            def one(p, ca, c=c):
                return core.predict_clique(p, ca, data, X, c)

            mus, vars_ = jax.vmap(one)(samples, caches)
            mu = jnp.mean(mus, axis=0)
            var = jnp.maximum(jnp.mean(vars_ + mus**2, axis=0) - mu**2, 1e-10)
            mu = mu * data.y_std  # component frame → raw scale (no mean shift)
            sd = jnp.sqrt(var) * data.y_std
            total = total + mu - params.kappa * sd
        return total


class MOMeanSigmaLCB(Acquisition):
    """2 objectives (μ, -σ) + 1 constraint (LCB < τ).

    Parity: reference acq.py:99-129.
    """

    num_obj = 2
    num_constr = 1

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)
        lcb = mu - params.kappa * sigma
        constr = lcb - params.tau  # feasible iff < 0
        return jnp.concatenate([mu, -sigma, constr], axis=-1)


class GeneralAcq(Acquisition):
    """m-objective, n-constraint LCB acquisition for GeneralBO.

    Parity: reference acq.py:192-242: objectives are per-output LCB
    (μ_i - κσ_i); constraints use the model's constraint outputs as
    μ_j - κ_c σ_j < 0 feasibility.
    """

    def __init__(self, num_obj: int, num_constr: int = 0, kappa: float = 2.0, c_kappa: float = 0.0):
        self.num_obj = num_obj
        self.num_constr = num_constr
        self.kappa = kappa
        self.c_kappa = c_kappa

    def eval_pure(self, model, state, params, X):
        mu, sigma = _predict(model, state, X)  # (P, num_obj + num_constr)
        obj = mu[:, : self.num_obj] - params.kappa * sigma[:, : self.num_obj]
        if self.num_constr:
            cm = mu[:, self.num_obj :]
            cs = sigma[:, self.num_obj :]
            constr = cm - self.c_kappa * cs
            return jnp.concatenate([obj, constr], axis=-1)
        return obj
