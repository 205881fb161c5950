"""Pallas fused Matérn gram kernel: interpret-mode correctness tests."""

import jax.numpy as jnp
import numpy as np

from hebo_tpu.ops.pallas_gram import matern32_gram, matern32_gram_reference


def test_matches_reference():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal((70, 5)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((45, 5)), jnp.float32)
    ls = jnp.asarray([0.5, 1.0, 2.0, 0.7, 1.5], jnp.float32)
    K_ref = matern32_gram_reference(x1, x2, ls, outputscale=1.7)
    K_pal = matern32_gram(x1, x2, ls, outputscale=1.7, interpret=True)
    np.testing.assert_allclose(np.asarray(K_pal), np.asarray(K_ref), rtol=1e-4, atol=1e-5)


def test_diagonal_jitter():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((33, 3)), jnp.float32)
    ls = jnp.ones(3, jnp.float32)
    K = matern32_gram(x, x, ls, outputscale=1.0, jitter=0.25, interpret=True)
    K0 = matern32_gram(x, x, ls, outputscale=1.0, jitter=0.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.diag(K) - jnp.diag(K0)), 0.25, atol=1e-5
    )
    # off-diagonal unaffected
    np.testing.assert_allclose(
        np.asarray(K - jnp.diag(jnp.diag(K))),
        np.asarray(K0 - jnp.diag(jnp.diag(K0))),
        atol=1e-6,
    )


def test_large_tile_multiple():
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((256, 4)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((128, 4)), jnp.float32)
    ls = jnp.full(4, 0.8, jnp.float32)
    K_ref = matern32_gram_reference(x1, x2, ls)
    K_pal = matern32_gram(x1, x2, ls, interpret=True)
    np.testing.assert_allclose(np.asarray(K_pal), np.asarray(K_ref), rtol=1e-4, atol=1e-5)
