"""Robust Cholesky with an in-graph jitter ladder.

The reference recovers from non-PSD kernel matrices by escalating jitter
×10 in a *python* retry loop around torch.cholesky
(HEBO/hebo/models/gp/gp.py:103-126) and by rolling back model state on
NotPSDError (MCBO/mcbo/models/gp/exact_gp.py:176-213).  On TPU a python
retry would force a retrace/recompile per failure; here the whole ladder
lives inside the jitted program: factorize at every rung, detect NaNs in
the factor, and ``where``-select the first rung that succeeded.  All
rungs execute unconditionally — on every real hot path the ladder sits
under a vmapped restart/sample axis where a ``lax.cond`` would lower to
``select`` (both branches run) anyway, and the branch-free form composes
cleanly with ``shard_map``'s varying-axis tracking.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["safe_cholesky", "chol_solve", "chol_logdet", "make_masked_nll"]

_LADDER = (0.0, 1e-6, 1e-4, 1e-2, 1.0)


def safe_cholesky(K: jnp.ndarray, base_jitter: float = 1e-6, rungs=None):
    """Cholesky of ``K + jitter*I`` escalating jitter until success.

    Returns ``(L, ok)`` where ``ok`` is False only if even the largest
    rung failed (callers then fall back to a unit-Gaussian posterior,
    mirroring reference gp.py:140-157).

    ``rungs``: jitter-multiplier ladder (default the full 5-rung ladder).
    Hot fit loops pass a short ladder — every rung costs a factorization
    unconditionally, and a failed step inside an optimizer loop is cheap
    to absorb (NaN-guarded gradients), whereas the posterior cache wants
    maximum robustness.
    """
    rungs = _LADDER if rungs is None else tuple(rungs)
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    diag_mean = jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1)
    # scale-aware jitter: rungs are relative to the mean diagonal
    scale = jnp.maximum(diag_mean, 1e-12)

    def attempt(jit_mult):
        L = jnp.linalg.cholesky(K + (base_jitter + jit_mult * scale) * eye)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    L, ok = attempt(jnp.asarray(rungs[0], K.dtype))

    for rung in rungs[1:]:
        L2, ok2 = attempt(jnp.asarray(rung, K.dtype))
        take = (~ok) & ok2
        L = jnp.where(take, L2, L)
        ok = ok | ok2
    return L, ok


def chol_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``K x = b`` given ``K = L L^T``."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def chol_logdet(L: jnp.ndarray) -> jnp.ndarray:
    """log|K| from the Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


@lru_cache(maxsize=None)
def make_masked_nll(rungs: tuple, base_jitter: float = 1e-6):
    """Gaussian NLL ``0.5(rᵀS⁻¹r + log|S| + n·log 2π)`` of ``S = Kt``
    with an **analytic custom VJP**.

    Autodiff through the jitter-ladder Cholesky makes XLA differentiate
    every factorization and triangular solve — on TPU the compiled grad
    program does ~10 GFLOP and moves ~670 MB per 1024-bucket matrix
    (experiments/chol_probe.json cost analysis), mostly expander-serial
    TriangularSolve/While chains.  The gradient has a closed form:

        ∂NLL/∂S = ½ (S⁻¹ − α αᵀ),   α = S⁻¹ r,   ∂NLL/∂r = α,

    so the backward pass is ONE triangular solve against I plus a
    matmul — everything upstream (kernel gram, noise assembly, masking)
    is cheap elementwise work left to regular autodiff.  On failure of
    every rung the primal is 1e10 and all gradients are zero (the fit
    loops' NaN/clip guard then makes the step a no-op, mirroring the
    reference's give-up path, gp.py:103-126).
    """

    def _fwd_impl(Kt, r, n_act):
        L, ok = safe_cholesky(Kt, base_jitter, rungs)
        alpha = chol_solve(L, r)
        quad = jnp.sum(r * alpha)
        val = 0.5 * (quad + chol_logdet(L) + n_act * math.log(2.0 * math.pi))
        val = jnp.where(ok, val, jnp.asarray(1e10, Kt.dtype))
        # n_act rides along so its zero cotangent inherits the primal's
        # varying-axis metadata under shard_map (a fresh constant would
        # not match and trips the custom-VJP vma check)
        return val, (L, alpha, ok, n_act)

    @jax.custom_vjp
    def masked_nll(Kt, r, n_act):
        return _fwd_impl(Kt, r, n_act)[0]

    def _bwd(res, g):
        L, alpha, ok, n_act = res
        n = L.shape[-1]
        eye = jnp.eye(n, dtype=L.dtype)
        W = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        Sinv = lax.dot(
            W.T, W, precision=lax.Precision.HIGHEST
        )
        G = 0.5 * (Sinv - alpha * alpha.T)  # broadcast outer (exact f32)
        G = jnp.where(ok, G, 0.0) * g
        dr = jnp.where(ok, alpha, 0.0) * g
        return G, dr, n_act * 0.0

    masked_nll.defvjp(lambda Kt, r, n_act: _fwd_impl(Kt, r, n_act), _bwd)
    return masked_nll
