"""Large-N GP solves: pivoted-Cholesky-preconditioned conjugate gradients.

The reference sidesteps large N entirely — GPyTorch's ``max_cholesky_size``
context plus a hard **training-set subsample cap of 1000 points**
(MCBO/mcbo/models/gp/exact_gp.py:120-294, ``max_training_dataset_size``).
The TPU-native long-axis answer (SURVEY.md §5.7 "block-sharded Cholesky /
CG when N grows"): keep ALL data in the posterior and replace the dense
O(N³) factorization with matrix-free solves:

* ``pivoted_cholesky`` — rank-k partial Cholesky with greedy diagonal
  pivoting (the classic GPyTorch/Harbrecht preconditioner).  Fixed k
  iterations of vectorized rank-1 updates; fully jittable.
* ``pcg_solve`` — batched (block-RHS) conjugate gradients on
  ``K x = B`` with the Woodbury-inverted preconditioner
  ``M = P Pᵀ + δ I``.  A fixed iteration budget keeps shapes static; the
  residual mask freezes converged columns so extra iterations are no-ops
  numerically.

Both operate on an *apply* callback ``matvec(X) -> K @ X`` so the kernel
matrix never needs materializing when a fused matvec is cheaper; the GP
core passes a dense gram (HBM-resident) for N ≤ ~64k and can swap in a
Pallas tiled matvec beyond that.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pivoted_cholesky", "pcg_solve", "woodbury_precond_apply"]


def pivoted_cholesky(K: jnp.ndarray, rank: int, jitter: float = 1e-6):
    """Rank-``rank`` pivoted (partial) Cholesky of PSD ``K`` (N, N).

    Returns ``P`` (N, rank) with ``K ≈ P Pᵀ``.  Greedy diagonal pivoting;
    each step is O(N) given the running diagonal, plus one row gather.
    """
    N = K.shape[0]

    def step(carry, i):
        d, Pk = carry  # d: running diagonal residual (N,), Pk: (N, rank)
        j = jnp.argmax(d)
        dj = jnp.maximum(d[j], jitter)
        # residual row j: K[j] - Pk[j] @ Pkᵀ
        row = K[j] - Pk @ Pk[j]
        col = row / jnp.sqrt(dj)
        col = col.at[j].set(jnp.sqrt(dj))
        d_new = jnp.maximum(d - col**2, 0.0)
        d_new = d_new.at[j].set(0.0)
        Pk = Pk.at[:, i].set(col)
        return (d_new, Pk), None

    d0 = jnp.diagonal(K)
    P0 = jnp.zeros((N, rank), K.dtype)
    (d, P), _ = lax.scan(step, (d0, P0), jnp.arange(rank))
    return P


def woodbury_precond_apply(P: jnp.ndarray, delta: jnp.ndarray):
    """Build ``apply(B) = (P Pᵀ + δ I)^{-1} B`` via the Woodbury identity.

    ``(PPᵀ+δI)^{-1} = (I - P (δ I_k + PᵀP)^{-1} Pᵀ) / δ``."""
    k = P.shape[1]
    A = delta * jnp.eye(k, dtype=P.dtype) + P.T @ P  # (k, k)
    L = jnp.linalg.cholesky(A + 1e-6 * jnp.eye(k, dtype=P.dtype))

    def apply(B):
        t = P.T @ B  # (k, R)
        y = jax.scipy.linalg.cho_solve((L, True), t)
        return (B - P @ y) / delta

    return apply


def pcg_solve(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    B: jnp.ndarray,
    *,
    precond_apply: Optional[Callable] = None,
    n_iters: int = 64,
    tol: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block preconditioned CG: solve ``K X = B`` for B (N, R).

    Fixed ``n_iters`` (static shapes); converged columns are frozen by a
    per-column active mask.  Returns (X, final residual norms (R,))."""
    Mi = precond_apply if precond_apply is not None else (lambda x: x)
    X = jnp.zeros_like(B)
    Rr = B  # residual
    Z = Mi(Rr)
    Pd = Z
    rz = jnp.sum(Rr * Z, axis=0)  # (R,)
    b_norm = jnp.maximum(jnp.linalg.norm(B, axis=0), 1e-30)

    def body(carry, _):
        X, Rr, Pd, rz = carry
        KP = matvec(Pd)
        denom = jnp.sum(Pd * KP, axis=0)
        active = jnp.linalg.norm(Rr, axis=0) / b_norm > tol
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        alpha = jnp.where(active, alpha, 0.0)
        X = X + alpha[None, :] * Pd
        Rr_new = Rr - alpha[None, :] * KP
        Z_new = Mi(Rr_new)
        rz_new = jnp.sum(Rr_new * Z_new, axis=0)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        Pd = Z_new + beta[None, :] * Pd
        return (X, Rr_new, Pd, rz_new), None

    (X, Rr, _, _), _ = lax.scan(body, (X, Rr, Pd, rz), None, length=n_iters)
    return X, jnp.linalg.norm(Rr, axis=0) / b_norm
