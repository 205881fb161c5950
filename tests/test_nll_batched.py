"""Batched masked NLL (`ops/chol.make_masked_nll_batched`) contracts.

The batched op replaced `vmap(make_masked_nll)` on the hot fit paths
(gp.fit_from_batched → HEBO fused suggest), so it must agree with the
per-matrix custom-VJP NLL exactly: values, gradients, ladder-escalation
behavior, and the all-fail zero-gradient branch — per matrix within a
mixed batch.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hebo_tpu.ops.chol import make_masked_nll, make_masked_nll_batched

RUNGS = (0.0, 1e-3)


def _systems(rng, B=6, n=64, n_act=48, bad=()):
    Kts, rs = [], []
    for b in range(B):
        A = rng.normal(size=(n_act, n_act)).astype(np.float32)
        Ka = A @ A.T / n_act + 0.5 * np.eye(n_act, dtype=np.float32)
        if b in bad:
            Ka = -5.0 * np.eye(n_act, dtype=np.float32)
        Kt = np.eye(n, dtype=np.float32)
        Kt[:n_act, :n_act] = Ka
        r = rng.normal(size=(n, 1)).astype(np.float32)
        r[n_act:] = 0
        Kts.append(Kt)
        rs.append(r)
    return (
        jnp.asarray(np.stack(Kts)),
        jnp.asarray(np.stack(rs)),
        jnp.full((B,), float(n_act), jnp.float32),
    )


def test_batched_matches_vmapped_per_matrix():
    Kt, r, na = _systems(np.random.default_rng(0))
    fb = make_masked_nll_batched(RUNGS)
    f1 = make_masked_nll(RUNGS)
    np.testing.assert_allclose(
        np.asarray(fb(Kt, r, na)),
        np.asarray(jax.vmap(f1)(Kt, r, na)),
        rtol=1e-5, atol=1e-4,
    )
    gb = jax.grad(lambda K, R: jnp.sum(fb(K, R, na)), argnums=(0, 1))(Kt, r)
    g1 = jax.vmap(
        jax.grad(lambda K, R, a: f1(K, R, a), argnums=(0, 1))
    )(Kt, r, na)
    for a, b in zip(gb, g1):
        assert float(jnp.abs(a - b).max()) < 2e-4


def test_batched_failure_isolated_per_matrix():
    Kt, r, na = _systems(np.random.default_rng(1), bad=(2,))
    fb = make_masked_nll_batched(RUNGS)
    v = np.asarray(fb(Kt, r, na))
    assert v[2] == 1e10
    assert np.isfinite(v).all() and (v[[0, 1, 3, 4, 5]] < 1e9).all()
    gK = np.asarray(jax.grad(lambda K: jnp.sum(fb(K, r, na)))(Kt))
    assert np.all(gK[2] == 0.0)
    assert np.all(np.isfinite(gK))
    assert np.abs(gK[[0, 1, 3]]).max() > 0


def test_batched_second_rung_escalation():
    """A matrix that fails rung 0 but is rescued by 1e-3·scale: the
    batched ladder (lax.cond branch) must produce a finite value equal
    to the per-matrix ladder's."""
    rng = np.random.default_rng(2)
    Kt, r, na = _systems(rng)
    n_act = 48
    A = rng.normal(size=(n_act, n_act)).astype(np.float32)
    Q, _ = np.linalg.qr(A)
    eigs = np.linspace(-2e-4, 3.0, n_act).astype(np.float32)
    Ka = (Q * eigs[None, :]) @ Q.T
    Kt = np.array(Kt, copy=True)
    Kt[3][:n_act, :n_act] = Ka
    Kt = jnp.asarray(Kt)
    fb = make_masked_nll_batched(RUNGS)
    f1 = make_masked_nll(RUNGS)
    vb = np.asarray(fb(Kt, r, na))
    v1 = np.asarray(jax.vmap(f1)(Kt, r, na))
    assert np.isfinite(vb[3]) and vb[3] < 1e9, "escalation must rescue"
    np.testing.assert_allclose(vb, v1, rtol=1e-5, atol=1e-4)


def test_fit_from_batched_matches_quality():
    """Product-level: batched-restart pSGLD fit reaches the same NLL
    quality as the per-restart vmapped path on the same data."""
    from hebo_tpu.models.gp.gp import GPCore, _make_data

    d = 3
    rng = np.random.default_rng(3)
    X = rng.uniform(-1, 1, (40, d)).astype(np.float32)
    y = np.sin(X.sum(1, keepdims=True)).astype(np.float32)
    core = GPCore(
        numeric_dims=tuple(range(d)), cat_dims=(), num_categories=(),
        n_steps=30,
    )
    data = _make_data(X, y, core.numeric_dims, 64)
    R = 4
    keys = jax.random.split(jax.random.PRNGKey(0), R + 1)
    p0 = jax.vmap(lambda k: core.init_params(k, data))(keys[:R])
    pf_b, loss_b, samples_b = core.fit_from_batched(keys[R], p0, data)
    assert loss_b.shape == (R,)
    assert jax.tree.leaves(samples_b)[0].shape[:2] == (core.n_ensemble, R)

    pf_v, loss_v, _ = jax.vmap(
        lambda k, p: core.fit_from(k, p, data)
    )(jax.random.split(jax.random.PRNGKey(1), R), p0)
    # same-quality optimum (stochastic optimizers: compare best-of-R)
    assert float(loss_b.min()) < float(loss_v.min()) + 1.0
