"""Distributed blocked Cholesky over the virtual device mesh (SURVEY §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hebo_tpu.ops.block_chol import (
    block_chol_solve_sharded,
    block_cholesky_sharded,
)


def _spd(n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, 24)).astype(dtype)
    return (A @ A.T + n * np.eye(n)).astype(dtype)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("shard",))


@pytest.mark.parametrize("n_dev,block", [(2, 64), (4, 64), (8, 32)])
def test_block_cholesky_matches_dense(n_dev, block):
    K = _spd(256, seed=n_dev)
    L = np.asarray(
        block_cholesky_sharded(jnp.asarray(K), _mesh(n_dev), block=block, jitter=0.0)
    )
    Lref = np.linalg.cholesky(K)
    assert np.abs(L - Lref).max() / np.abs(Lref).max() < 5e-5
    # strictly lower-triangular output (masked junk cleared)
    assert np.allclose(L, np.tril(L))


def test_block_chol_solve_residual():
    K = _spd(512, seed=3)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((512, 4)).astype(np.float32)
    x = np.asarray(
        block_chol_solve_sharded(
            jnp.asarray(K), jnp.asarray(b), _mesh(8), block=64, jitter=0.0
        )
    )
    assert np.abs(K @ x - b).max() < 1e-2


def test_block_cholesky_jitter_rescues_singular():
    # rank-deficient K: plain Cholesky would produce NaNs; jitter saves it
    A = np.random.default_rng(5).standard_normal((128, 8)).astype(np.float32)
    K = (A @ A.T).astype(np.float32)  # rank 8 << 128
    L = np.asarray(
        block_cholesky_sharded(jnp.asarray(K), _mesh(4), block=32, jitter=1e-2)
    )
    assert np.all(np.isfinite(L))
    err = np.abs(L @ L.T - (K + 1e-2 * np.eye(128))).max()
    assert err < 1e-2
