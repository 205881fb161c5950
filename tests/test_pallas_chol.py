"""Pallas batched Cholesky kernel (ops/pallas_chol.py), interpret mode.

The kernel is a measured exploration (ROOFLINE.md §3): correct on chip
but not wired into the product path. These tests pin its correctness
contract on the CPU interpreter so the chip variant can be revisited.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.ops.pallas_chol import (
    chol_inv_batched,
    cholesky_batched,
    pallas_chol_supported,
)


@pytest.mark.parametrize("B,N", [(3, 128), (2, 256)])
def test_matches_xla_cholesky(B, N):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, N, 32)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2)) + 32.0 * jnp.eye(
        N, dtype=jnp.float32
    )
    L = cholesky_batched(K, interpret=True)
    Lr = jnp.linalg.cholesky(K)
    rel = float(jnp.max(jnp.abs(L - Lr))) / float(jnp.max(jnp.abs(Lr)))
    assert rel < 2e-5
    # strictly lower triangular output (junk cleared)
    iu = np.triu_indices(N, k=1)
    assert float(jnp.max(jnp.abs(np.asarray(L)[:, iu[0], iu[1]]))) == 0.0


def test_fused_inverse():
    rng = np.random.default_rng(1)
    B, N = 2, 256
    A = rng.standard_normal((B, N, 16)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2)) + 16.0 * jnp.eye(
        N, dtype=jnp.float32
    )
    L, W = chol_inv_batched(K, interpret=True)
    WL = jnp.einsum("bij,bjk->bik", W, L)
    assert float(jnp.max(jnp.abs(WL - jnp.eye(N)[None]))) < 1e-3


def test_nonpsd_propagates_nan():
    Kbad = jnp.asarray(
        np.diag([1.0, -1.0] + [1.0] * 126).astype(np.float32)
    )[None]
    L = cholesky_batched(Kbad, interpret=True)
    assert bool(jnp.any(jnp.isnan(L)))


def test_supported_shapes():
    assert pallas_chol_supported(128)
    assert pallas_chol_supported(1024)
    assert not pallas_chol_supported(96)
    assert not pallas_chol_supported(4096)
