"""HBM-slab Pallas Cholesky (+ fused L⁻¹) — interpret-mode contracts.

VERDICT r3 #1: the slab kernels (`ops/pallas_chol.chol_inv_slab`) give
in-kernel batch vectorization at every supported N (the r3 VMEM-resident
kernel capped the batch at 1 for N=1024).  On CPU they run under the
Pallas interpreter against `np.linalg.cholesky`; chip-side timing lives
in experiments/slab_probe.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hebo_tpu.ops.pallas_chol import chol_inv_slab, slab_supported


def _spd(rng, B, N):
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    return A @ np.transpose(A, (0, 2, 1)) / N + 0.5 * np.eye(
        N, dtype=np.float32
    )


@pytest.mark.parametrize("B,N", [(3, 128), (5, 256), (2, 512), (17, 256)])
def test_slab_matches_reference(B, N):
    rng = np.random.default_rng(0)
    K = _spd(rng, B, N)
    L, W = chol_inv_slab(jnp.asarray(K), interpret=True)
    L, W = np.asarray(L), np.asarray(W)
    Lr = np.linalg.cholesky(K)
    assert np.abs(L - Lr).max() < 1e-3
    # fused inverse: W @ L == I to f32 accuracy
    assert np.abs(
        np.einsum("bij,bjk->bik", W, Lr) - np.eye(N, dtype=np.float32)
    ).max() < 1e-3
    # strictly-lower structure
    assert np.abs(np.triu(L, 1)).max() == 0.0
    assert np.abs(np.triu(W, 1)).max() == 0.0


def test_slab_nan_propagation_on_non_psd():
    """Failure contract: a non-PSD matrix yields NaNs (the jitter ladder
    detects exactly this), and OTHER matrices in the batch stay clean."""
    rng = np.random.default_rng(1)
    K = _spd(rng, 3, 256)
    K[1] = -np.eye(256, dtype=np.float32)
    L, W = chol_inv_slab(jnp.asarray(K), interpret=True)
    L = np.asarray(L)
    assert not np.all(np.isfinite(L[1]))
    assert np.all(np.isfinite(L[0])) and np.all(np.isfinite(L[2]))
    Lr = np.linalg.cholesky(K[[0, 2]])
    assert np.abs(L[[0, 2]] - Lr).max() < 1e-3


def test_slab_supported_shapes():
    assert slab_supported(128) and slab_supported(1024)
    assert slab_supported(4096)
    assert not slab_supported(96) and not slab_supported(8192)
