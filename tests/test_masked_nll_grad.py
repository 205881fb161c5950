"""Contract tests for the analytic custom-VJP masked NLL (ops/chol.py).

``make_masked_nll`` replaced autodiff in EVERY GP fit path
(pSGLD/Adam/HMC/SVI/SMC, gp.py:363), and a cotangent bug under shard_map
was hit and fixed once (commit 1b70dc3) — so the backward is contract-
tested here against ``jax.grad`` of an equivalent ladder-free NLL on
random SPD systems: masked/padded rows, both jitter rungs of the fit
ladder, the all-rungs-fail branch (exact-zero gradients), and under
``shard_map`` on the 8-device CPU mesh.  A teeth-check asserts the
tolerance would catch a perturbed ``Sinv − ααᵀ`` term (VERDICT r3 #3).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.ops.chol import make_masked_nll, safe_cholesky

RUNGS = (0.0, 1e-3)  # the fit-path ladder (models/gp/gp.py:363)
BASE = 1e-6


def _plain_nll(jitter_const: float):
    """Ladder-free reference NLL with the jitter as a CONSTANT.

    The analytic VJP deliberately treats the selected rung's jitter as a
    numerical-robustness constant (no gradient through scale=mean(diag)),
    so the reference must too.
    """

    def nll(Kt, r, n_act):
        n = Kt.shape[-1]
        S = Kt + jitter_const * jnp.eye(n, dtype=Kt.dtype)
        L = jnp.linalg.cholesky(S)
        alpha = jax.scipy.linalg.cho_solve((L, True), r)
        quad = jnp.sum(r * alpha)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return 0.5 * (quad + logdet + n_act * math.log(2.0 * math.pi))

    return nll


def _masked_system(key, n=64, n_act=48, min_eig=0.05):
    """Kt with a controlled-spectrum ACTIVE block + identity padding.

    The spectrum is set on the active block itself (not on a larger
    matrix that then gets masked — interlacing would wash out a planted
    negative eigenvalue), so ``min_eig`` is exactly the smallest
    eigenvalue the factorization sees.
    """
    ka, kb = jax.random.split(key)
    A = jax.random.normal(ka, (n_act, n_act), jnp.float32)
    Q, _ = jnp.linalg.qr(A)
    eigs = jnp.linspace(min_eig, 3.0, n_act).astype(jnp.float32)
    Ka = (Q * eigs[None, :]) @ Q.T
    Kt = jnp.eye(n, dtype=jnp.float32)
    Kt = Kt.at[:n_act, :n_act].set(Ka)
    m = (jnp.arange(n) < n_act).astype(jnp.float32)
    r = jax.random.normal(kb, (n, 1), jnp.float32) * m[:, None]
    return Kt, r, jnp.sum(m)


def _effective_jitter(Kt, rung_mult):
    scale = float(jnp.maximum(jnp.mean(jnp.diagonal(Kt)), 1e-12))
    return BASE + rung_mult * scale


def test_vjp_matches_autodiff_rung0():
    Kt, r, n_act = _masked_system(jax.random.PRNGKey(0))
    L, ok = safe_cholesky(Kt, BASE, (RUNGS[0],))
    assert bool(ok), "system must succeed at rung 0 for this test"

    nll = make_masked_nll(RUNGS)
    ref = _plain_nll(_effective_jitter(Kt, RUNGS[0]))

    v = nll(Kt, r, n_act)
    v_ref = ref(Kt, r, n_act)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)

    gK, gr = jax.grad(nll, argnums=(0, 1))(Kt, r, n_act)
    gK_ref, gr_ref = jax.grad(ref, argnums=(0, 1))(Kt, r, n_act)
    np.testing.assert_allclose(np.asarray(gK), np.asarray(gK_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=2e-4, atol=2e-5)


def test_vjp_matches_autodiff_second_rung():
    # min_eig < -BASE so rung 0 fails; rung 1e-3·scale recovers it
    Kt, r, n_act = _masked_system(jax.random.PRNGKey(1), min_eig=-2e-4)
    _, ok0 = safe_cholesky(Kt, BASE, (RUNGS[0],))
    _, ok1 = safe_cholesky(Kt, BASE, RUNGS)
    assert not bool(ok0), "rung 0 must fail (else this test is vacuous)"
    assert bool(ok1), "rung 1 must succeed"

    nll = make_masked_nll(RUNGS)
    ref = _plain_nll(_effective_jitter(Kt, RUNGS[1]))

    np.testing.assert_allclose(
        float(nll(Kt, r, n_act)), float(ref(Kt, r, n_act)), rtol=1e-5
    )
    gK, gr = jax.grad(nll, argnums=(0, 1))(Kt, r, n_act)
    gK_ref, gr_ref = jax.grad(ref, argnums=(0, 1))(Kt, r, n_act)
    np.testing.assert_allclose(np.asarray(gK), np.asarray(gK_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=2e-4, atol=2e-5)


def test_all_rungs_fail_exact_zero_grad():
    # eigenvalue at −10·scale defeats every rung in the fit ladder
    Kt, r, n_act = _masked_system(jax.random.PRNGKey(2), min_eig=-30.0)
    _, ok = safe_cholesky(Kt, BASE, RUNGS)
    assert not bool(ok), "all rungs must fail"

    nll = make_masked_nll(RUNGS)
    assert float(nll(Kt, r, n_act)) == 1e10
    gK, gr = jax.grad(nll, argnums=(0, 1))(Kt, r, n_act)
    # exactly zero — the optimizer's step must be a strict no-op
    assert np.all(np.asarray(gK) == 0.0)
    assert np.all(np.asarray(gr) == 0.0)
    assert np.all(np.isfinite(np.asarray(gK)))


def test_tolerance_catches_perturbed_backward():
    """The rtol above has teeth: a 1% perturbation of the ααᵀ term in the
    backward (the exact term of commit 1b70dc3's bug class) would exceed
    the test tolerance by a wide margin."""
    Kt, r, n_act = _masked_system(jax.random.PRNGKey(3))
    ref = _plain_nll(_effective_jitter(Kt, 0.0))
    gK_ref = jax.grad(ref)(Kt, r, n_act)

    n = Kt.shape[0]
    S = Kt + _effective_jitter(Kt, 0.0) * jnp.eye(n, dtype=Kt.dtype)
    L = jnp.linalg.cholesky(S)
    W = jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=L.dtype),
                                          lower=True)
    Sinv = W.T @ W
    alpha = jax.scipy.linalg.cho_solve((L, True), r)
    G_perturbed = 0.5 * (Sinv - 1.01 * (alpha * alpha.T))

    diff = np.abs(np.asarray(G_perturbed) - np.asarray(gK_ref))
    denom = np.abs(np.asarray(gK_ref)) + 2e-5
    # the perturbation must violate the contract tolerance decisively
    assert np.max(diff / denom) > 10 * 2e-4


def test_vjp_under_shard_map():
    """Grad of a psum'd masked NLL under shard_map == vmapped grads.

    This is the configuration that bit once (commit 1b70dc3): per-device
    systems, shard_map over the 8-device mesh, cotangents must carry the
    right varying-axis metadata."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("d",))
    P = jax.sharding.PartitionSpec

    n = 32
    keys = jax.random.split(jax.random.PRNGKey(4), 8)
    sys_ = [_masked_system(k, n=n, n_act=24) for k in keys]
    Kts = jnp.stack([s[0] for s in sys_])            # (8, n, n)
    rs = jnp.stack([s[1] for s in sys_])             # (8, n, 1)
    n_acts = jnp.stack([s[2] for s in sys_])         # (8,)

    nll = make_masked_nll(RUNGS)

    def device_body(Kt, r, n_act):
        val = nll(Kt[0], r[0], n_act[0])
        return jax.lax.psum(val, "d")

    def total(Kts, rs, n_acts):
        f = jax.shard_map(
            device_body, mesh=mesh,
            in_specs=(P("d"), P("d"), P("d")),
            out_specs=P(),
        )
        return f(Kts, rs, n_acts)

    gK_sm = jax.grad(total)(Kts, rs, n_acts)
    gK_vm = jax.vmap(jax.grad(lambda K, r, na: nll(K, r, na)))(
        Kts, rs, n_acts
    )
    np.testing.assert_allclose(np.asarray(gK_sm), np.asarray(gK_vm),
                               rtol=2e-4, atol=2e-5)
