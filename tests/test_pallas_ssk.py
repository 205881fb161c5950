"""Pallas SSK Gram kernel vs the einsum reference (ops/pallas_ssk.py;
reference semantics: MCBO SubStringKernel models/gp/kernels.py:198)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.models.gp.kernels import ssk_kernel
from hebo_tpu.ops.pallas_ssk import ssk_gram


def _seqs(n, L=11, V=5, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, V, (n, L)), jnp.int32)


def test_values_match_einsum_reference():
    s1, s2 = _seqs(10), _seqs(7, seed=1)
    K_ref = ssk_kernel(s1.astype(jnp.float32), s2.astype(jnp.float32), 0.6, 0.7, 3)
    K_pal = ssk_gram(s1, s2, jnp.float32(0.6), jnp.float32(0.7), 3, interpret=True)
    np.testing.assert_allclose(np.asarray(K_pal), np.asarray(K_ref), atol=1e-5)


def test_gradients_match_reference():
    s1, s2 = _seqs(6), _seqs(5, seed=2)

    def loss_ref(md, gd):
        return jnp.sum(
            ssk_kernel(s1.astype(jnp.float32), s2.astype(jnp.float32), md, gd, 3) ** 2
        )

    def loss_pal(md, gd):
        return jnp.sum(ssk_gram(s1, s2, md, gd, 3, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(jnp.float32(0.6), jnp.float32(0.7))
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(jnp.float32(0.6), jnp.float32(0.7))
    np.testing.assert_allclose(float(g_pal[0]), float(g_ref[0]), rtol=1e-3)
    np.testing.assert_allclose(float(g_pal[1]), float(g_ref[1]), rtol=1e-3)


def test_self_similarity_is_one():
    s = _seqs(9, seed=3)
    K = np.asarray(ssk_gram(s, s, jnp.float32(0.5), jnp.float32(0.5), 3, interpret=True))
    np.testing.assert_allclose(np.diag(K), 1.0, atol=1e-5)
    assert K.max() <= 1.0 + 1e-5


def test_non_tile_multiple_sizes_padded():
    # N, M not multiples of the 8-pair tile
    s1, s2 = _seqs(13, seed=4), _seqs(5, seed=5)
    K_ref = ssk_kernel(s1.astype(jnp.float32), s2.astype(jnp.float32), 0.4, 0.8, 2)
    K_pal = ssk_gram(s1, s2, jnp.float32(0.4), jnp.float32(0.8), 2, interpret=True)
    assert K_pal.shape == (13, 5)
    np.testing.assert_allclose(np.asarray(K_pal), np.asarray(K_ref), atol=1e-5)


def test_gp_fit_with_pallas_ssk_matches_einsum():
    from hebo_tpu.design_space import DesignSpace
    from hebo_tpu.models import get_model

    space = DesignSpace().parse(
        [{"name": f"p{i}", "type": "cat", "categories": list("ACGU")} for i in range(6)]
    )
    X = space.transform(space.sample(24, seed=0))
    y = (X == 0).sum(axis=1, keepdims=True).astype(np.float32)
    m1 = get_model("gp", space, cat_kernel="ssk", num_epochs=10).fit(X, y)
    m2 = get_model(
        "gp", space, cat_kernel="ssk", num_epochs=10,
        use_pallas=True, pallas_interpret=True,
    ).fit(X, y)
    mu1, _ = m1.predict(X[:6])
    mu2, _ = m2.predict(X[:6])
    np.testing.assert_allclose(mu2, mu1, atol=1e-3)
