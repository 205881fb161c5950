"""Data-driven decomposition structure learning (RDUCB `learnDependencyStructure`).

Parity target: RDUCB's Gibbs-style group-assignment learner
(RDUCB/hdbo/function_optimizer.py:630-712 ``GraphNonOverlap._optimize_hypotheses``):
each dimension's group id z_j is resampled via the Gumbel-max trick with
scores = additive-GP data log-likelihood of the candidate assignment, under a
max-group-size prior; the best-likelihood hypothesis over all sweeps wins.
The edge-flip hill-climb variants (``GraphOverlap``/``Tree``,
function_optimizer.py:713-860) explore the same additive-likelihood surface;
the assignment parameterization covers the non-overlapping hypothesis space
they reduce to when cycles are disabled (max_group_size=2 override,
function_optimizer.py:631-639).

TPU-native design (not a port):
* The reference builds a fresh GPy model per candidate graph and calls
  ``log_likelihood()`` serially — O(sweeps * D * M) python-level GP
  constructions.  Here the per-dimension log-kernels are computed ONCE as a
  (D, N, N) stack; any assignment's additive Gram is a one-hot einsum over
  that stack followed by exp/sum, so scoring all M candidate moves for a
  dimension is a single ``vmap`` over batched Cholesky factorizations —
  MXU-friendly, zero host sync.
* The whole learner (sweeps x dims Gibbs scan) is ONE jitted program:
  ``lax.fori_loop`` over moves, fixed shapes, Gumbel sampling with an
  explicit PRNG key.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.chol import chol_logdet, safe_cholesky

__all__ = ["dim_log_kernels", "assignment_mll", "learn_assignment", "assignment_to_cliques"]

_LOG2PI = math.log(2.0 * math.pi)


def dim_log_kernels(
    X: jnp.ndarray,
    x_lb: jnp.ndarray,
    x_span: jnp.ndarray,
    numeric_dims: Tuple[int, ...],
    cat_dims: Tuple[int, ...],
    lengthscale: float = 0.3,
) -> jnp.ndarray:
    """(D, N, N) stack of per-dimension log-kernels.

    Numeric dims: Matérn-5/2 on min-max-scaled columns with a fixed
    lengthscale (the reference scores structures at its current per-dim
    lengthscales, function_optimizer.py:705 ``optimize_dimensional_parameters``
    happens after structure search when ``fully_optimize_lengthscales`` is
    off).  Categorical dims: exp-agreement (overlap) kernel.
    """
    mats = []
    for d in range(X.shape[1]):
        col = X[:, d]
        if d in cat_dims:
            agree = (col[:, None] == col[None, :]).astype(jnp.float32)
            mats.append(agree - 1.0)  # log exp(theta*(agree-1)), theta=1
        else:
            j = numeric_dims.index(d)
            s = (col - x_lb[j]) / x_span[j]
            diff = jnp.abs(s[:, None] - s[None, :]) / lengthscale
            r = math.sqrt(5.0) * diff
            mats.append(jnp.log(1.0 + r + 5.0 * diff**2 / 3.0) - r)
    return jnp.stack(mats, axis=0)


def assignment_mll(
    z: jnp.ndarray,
    Ld: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    M: int,
    noise: float = 1e-2,
) -> jnp.ndarray:
    """Marginal log-likelihood of the additive GP implied by assignment z.

    K = sum_m [group m nonempty] * exp(sum_{d: z_d=m} Ld[d]) / n_groups,
    evaluated on masked (padded) data: padded rows/cols are replaced by
    identity so they contribute 0 to the quadratic form and log-det.
    """
    D = Ld.shape[0]
    n = Ld.shape[1]
    Z = jax.nn.one_hot(z, M, dtype=jnp.float32)  # (D, M)
    S = jnp.einsum("dm,dij->mij", Z, Ld)  # (M, N, N) group log-Grams
    counts = jnp.sum(Z, axis=0)  # (M,)
    nonempty = (counts > 0).astype(jnp.float32)
    n_groups = jnp.maximum(jnp.sum(nonempty), 1.0)
    K = jnp.einsum("m,mij->ij", nonempty, jnp.exp(S)) / n_groups
    m2 = (mask[:, None] & mask[None, :]).astype(jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    Kt = K * m2 + (1.0 - m2) * eye + noise * eye
    L, ok = safe_cholesky(Kt)
    ym = y[:, 0] * mask.astype(jnp.float32)
    a = jax.scipy.linalg.solve_triangular(L, ym[:, None], lower=True)
    n_eff = jnp.sum(mask.astype(jnp.float32))
    mll = -0.5 * jnp.sum(a * a) - chol_logdet(L) - 0.5 * n_eff * _LOG2PI
    return jnp.where(ok, mll, -jnp.inf)


@partial(jax.jit, static_argnames=("M", "max_group_size", "n_sweeps", "numeric_dims", "cat_dims"))
def learn_assignment(
    key: jax.Array,
    X: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    x_lb: jnp.ndarray,
    x_span: jnp.ndarray,
    numeric_dims: Tuple[int, ...],
    cat_dims: Tuple[int, ...],
    M: int = 4,
    max_group_size: int = 3,
    n_sweeps: int = 2,
    noise: float = 1e-2,
):
    """Gibbs sweeps over group assignments; returns (z_best, mll_best).

    One jitted program: lax.fori_loop over n_sweeps*D moves; each move
    scores all M candidate groups for one dimension with a vmapped batched
    Cholesky, adds Gumbel noise (the reference's Gumbel-max sampling,
    function_optimizer.py:653-684), masks moves that would exceed
    ``max_group_size``, and commits the argmax.
    """
    D = X.shape[1]
    Ld = dim_log_kernels(X, x_lb, x_span, numeric_dims, cat_dims)
    mll = partial(assignment_mll, Ld=Ld, y=y, mask=mask, M=M, noise=noise)

    k_init, k_loop = jax.random.split(key)
    # feasible-by-construction init: round-robin over a random permutation
    # (group sizes differ by at most 1); every subsequent move preserves the
    # max_group_size invariant, so the returned best is always feasible.
    perm = jax.random.permutation(k_init, D)
    z0 = jnp.zeros((D,), jnp.int32).at[perm].set(jnp.arange(D, dtype=jnp.int32) % M)
    mll0 = mll(z0)

    def move(i, carry):
        z, best_z, best_mll, k = carry
        j = i % D
        k, kg = jax.random.split(k)
        gumbel = jax.random.gumbel(kg, (M,))

        # group sizes excluding dim j
        Z = jax.nn.one_hot(z, M, dtype=jnp.float32)
        sizes = jnp.sum(Z, axis=0) - Z[j]
        feasible = sizes + 1.0 <= float(max_group_size)

        def score(m):
            return mll(z.at[j].set(m))

        scores = jax.vmap(score)(jnp.arange(M))
        noisy = jnp.where(feasible, scores + gumbel, -jnp.inf)
        m_new = jnp.argmax(noisy)
        z = z.at[j].set(m_new)
        cur = scores[m_new]
        better = cur > best_mll
        best_z = jnp.where(better, z, best_z)
        best_mll = jnp.where(better, cur, best_mll)
        return z, best_z, best_mll, k

    _, best_z, best_mll, _ = jax.lax.fori_loop(
        0, n_sweeps * D, move, (z0, z0, mll0, k_loop)
    )
    return best_z, best_mll


def assignment_to_cliques(z: np.ndarray, M: int) -> List[Tuple[int, ...]]:
    """Host-side: assignment vector -> clique tuples (nonempty groups)."""
    out = []
    for m in range(M):
        dims = tuple(int(d) for d in np.nonzero(z == m)[0])
        if dims:
            out.append(dims)
    return out
