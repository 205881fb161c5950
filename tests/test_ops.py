"""Numerical contract tests: robust Cholesky, Pareto ops, transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.ops.chol import chol_logdet, chol_solve, safe_cholesky
from hebo_tpu.ops.pareto import (
    crowding_distance,
    domination_matrix,
    hypervolume_mc,
    nondominated_rank,
    pareto_mask,
)
from hebo_tpu.ops.transforms import (
    fit_power_transform,
    power_transform_y,
)


# ---------------------------------------------------------------- cholesky
def test_safe_cholesky_psd():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((12, 12))
    K = jnp.asarray(A @ A.T + 12 * np.eye(12), jnp.float32)
    L, ok = safe_cholesky(K)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K), rtol=2e-3, atol=2e-3)


def test_safe_cholesky_escalates_on_indefinite():
    # slightly indefinite matrix: plain cholesky fails, ladder recovers
    K = jnp.asarray(np.diag([1.0, 1.0, -1e-4]), jnp.float32)
    L, ok = safe_cholesky(K)
    assert bool(ok)
    assert np.all(np.isfinite(np.asarray(L)))


def test_chol_solve_and_logdet():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((8, 8))
    K = A @ A.T + 8 * np.eye(8)
    b = rng.standard_normal((8, 2))
    L, ok = safe_cholesky(jnp.asarray(K, jnp.float32))
    x = chol_solve(L, jnp.asarray(b, jnp.float32))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(K, b), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        float(chol_logdet(L)), np.linalg.slogdet(K)[1], rtol=1e-3
    )


# ------------------------------------------------------------------ pareto
def _naive_rank(F):
    F = np.asarray(F)
    P = len(F)
    dominated_by = [
        {j for j in range(P) if np.all(F[j] <= F[i]) and np.any(F[j] < F[i])}
        for i in range(P)
    ]
    rank = np.full(P, -1)
    r = 0
    remaining = set(range(P))
    while remaining:
        front = {i for i in remaining if not (dominated_by[i] & remaining)}
        for i in front:
            rank[i] = r
        remaining -= front
        r += 1
    return rank


def test_nondominated_rank_matches_naive():
    rng = np.random.default_rng(2)
    F = rng.standard_normal((40, 3)).astype(np.float32)
    got = np.asarray(nondominated_rank(jnp.asarray(F)))
    np.testing.assert_array_equal(got, _naive_rank(F))


def test_pareto_mask():
    F = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [1.0, 1.0], [0.5, 0.5]], jnp.float32)
    mask = np.asarray(pareto_mask(F))
    np.testing.assert_array_equal(mask, [True, True, False, True])


def test_crowding_boundary_inf():
    F = jnp.asarray([[0.0, 3.0], [1.0, 2.0], [2.0, 1.0], [3.0, 0.0]], jnp.float32)
    rank = nondominated_rank(F)
    crowd = np.asarray(crowding_distance(F, rank))
    assert np.isinf(crowd[0]) and np.isinf(crowd[3])
    assert np.isfinite(crowd[1]) and np.isfinite(crowd[2])


def test_hypervolume_mc_square():
    # single point at origin, ref (1,1): HV = 1 (whole sampled box dominated)
    F = jnp.zeros((1, 2), jnp.float32)
    hv = float(
        hypervolume_mc(F, jnp.ones(2), jax.random.PRNGKey(0), n_samples=4096)
    )
    assert abs(hv - 1.0) < 0.05


# -------------------------------------------------------------- transforms
def test_power_transform_positive():
    rng = np.random.default_rng(3)
    y = np.exp(rng.standard_normal(100))
    pt = fit_power_transform(y)
    t = power_transform_y(y, pt)
    assert abs(np.mean(t)) < 0.1
    assert 0.5 < np.std(t) < 2.0


def test_power_transform_mixed_sign():
    rng = np.random.default_rng(4)
    y = rng.standard_normal(100) * 10 - 2
    pt = fit_power_transform(y)
    t = power_transform_y(y, pt)
    assert np.all(np.isfinite(t))
    assert abs(np.mean(t)) < 0.15


def test_power_transform_degenerate_fallback():
    y = np.ones(10)
    pt = fit_power_transform(y)
    t = power_transform_y(y, pt)
    assert np.all(np.isfinite(t))


def test_power_transform_filters_nonfinite():
    y = np.array([1.0, 2.0, np.inf, 3.0, np.nan])
    pt = fit_power_transform(y)
    assert np.isfinite(pt.mean) and np.isfinite(pt.std)


# ------------------------------------------------ pymoo-fidelity survival
def _pymoo_crowding(F, rank):
    """Host-side exact pymoo calc_crowding_distance semantics, per front."""
    P, M = F.shape
    crowd = np.zeros(P)
    for r in np.unique(rank):
        idx = np.where(rank == r)[0]
        d = np.zeros(len(idx))
        for m in range(M):
            order = np.argsort(F[idx, m], kind="stable")
            f = F[idx][order, m]
            span = max(f[-1] - f[0], 1e-12)
            dm = np.zeros(len(idx))
            dm[order[0]] = np.inf
            dm[order[-1]] = np.inf
            for j in range(1, len(idx) - 1):
                dm[order[j]] = (f[j + 1] - f[j - 1]) / span
            d = d + dm
        crowd[idx] = d / M
    return crowd


def test_crowding_matches_pymoo_semantics():
    from hebo_tpu.ops.pareto import crowding_distance, nondominated_rank

    rng = np.random.default_rng(7)
    F = rng.standard_normal((48, 2)).astype(np.float32)
    rank = np.asarray(nondominated_rank(jnp.asarray(F)))
    got = np.asarray(crowding_distance(jnp.asarray(F), jnp.asarray(rank)))
    want = _pymoo_crowding(F.astype(np.float64), rank)
    inf_g, inf_w = np.isinf(got), np.isinf(want)
    np.testing.assert_array_equal(inf_g, inf_w)
    np.testing.assert_allclose(got[~inf_g], want[~inf_w], rtol=1e-4, atol=1e-5)


def test_nsga2_key_is_exact_lexsort():
    from hebo_tpu.ops.pareto import crowding_distance, nondominated_rank, nsga2_key

    rng = np.random.default_rng(11)
    F = rng.standard_normal((64, 3)).astype(np.float32)
    rank = nondominated_rank(jnp.asarray(F))
    crowd = crowding_distance(jnp.asarray(F), rank)
    key = np.asarray(nsga2_key(rank, crowd))
    got = np.argsort(key, kind="stable")
    # reference ordering: ascending rank, then descending crowding;
    # crowding ties broken by index (matching the ordinal construction)
    c = np.asarray(crowd)
    r = np.asarray(rank)
    crowd_ord = np.argsort(np.argsort(-c, kind="stable"), kind="stable")
    want = np.lexsort((crowd_ord, r))
    np.testing.assert_array_equal(got, want)
    # large distinct crowding values must NOT tie (the old tanh squash did)
    c2 = jnp.asarray([40.0, 80.0, 120.0, np.inf], jnp.float32)
    r2 = jnp.zeros(4, jnp.int32)
    k2 = np.asarray(nsga2_key(r2, c2))
    assert len(np.unique(k2)) == 4 and np.argmin(k2) == 3
