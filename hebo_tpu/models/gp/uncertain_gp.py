"""Uncertain-input GP (AIRBO): robust BO under input randomness.

Parity: AIRBO (/root/reference/AIRBO/, 8,010 LoC):
  * expected-RBF kernel over Gaussian input distributions
    (kernels/expected_rbf_kernel.py) — closed form: for x ~ N(m1, S1),
    x' ~ N(m2, S2) and RBF lengthscale ℓ (per-dim),
      E[k(x, x')] = Π_d  ℓ_d / sqrt(ℓ_d² + s1_d² + s2_d²)
                    · exp(-½ (m1_d - m2_d)² / (ℓ_d² + s1_d² + s2_d²)),
  * MMD kernel with Nyström approximation over empirical input
    distributions (kernels/mmd_kernel.py, kme_kernel.py):
      k(P, Q) = exp(-MMD²(P, Q) / (2 γ²)), the MMD estimated between
    sample sets through a shared Nyström feature map (landmark points →
    one MXU matmul per set),
  * uncertain-input GP models (models/mmd_gp.py, ugp.py, uncertain_gp.py)
    — here one GP whose kernel acts on input *distributions*.

The model treats each design x as the distribution N(x, diag(σ_in²));
σ_in is a user-supplied per-dim input-noise scale (the AIRBO setting).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import register_model
from .gp import GP, GPCore, GPData, GPParams

__all__ = ["expected_rbf", "mmd_nystrom_kernel", "UncertainGP"]


def expected_rbf(
    x1: jnp.ndarray, x2: jnp.ndarray, lengthscales: jnp.ndarray,
    in_std1: jnp.ndarray, in_std2: jnp.ndarray,
) -> jnp.ndarray:
    """Closed-form expected RBF kernel between Gaussian inputs.

    x1 (N, D), x2 (M, D); in_std* broadcastable (D,)."""
    l2 = lengthscales**2
    denom = l2 + in_std1**2 + in_std2**2  # (D,)
    pref = jnp.prod(jnp.sqrt(l2 / denom))
    d2 = jnp.sum(
        (x1[:, None, :] - x2[None, :, :]) ** 2 / denom[None, None, :], axis=-1
    )
    return pref * jnp.exp(-0.5 * d2)


def mmd_nystrom_kernel(
    S1: jnp.ndarray, S2: jnp.ndarray, landmarks: jnp.ndarray,
    gamma: float, feat_ls: float,
) -> jnp.ndarray:
    """MMD kernel between empirical sample sets via Nyström features.

    S1 (N, s, D), S2 (M, s, D), landmarks (m, D).  Feature map φ(x) =
    K_mm^{-1/2} k_m(x); MMD²(P,Q) ≈ ‖mean φ(S1) - mean φ(S2)‖² — the
    "40× more efficient than the integral kernel" trick (AIRBO README:21).
    """
    m = landmarks.shape[0]

    def rbf(a, b):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return jnp.exp(-0.5 * d2 / feat_ls**2)

    Kmm = rbf(landmarks, landmarks) + 1e-5 * jnp.eye(m)
    w, V = jnp.linalg.eigh(Kmm)
    W = V / jnp.sqrt(jnp.maximum(w, 1e-8))[None, :]  # Kmm^{-1/2} factor

    def mean_feat(S):
        flat = S.reshape(-1, S.shape[-1])
        phi = rbf(flat, landmarks) @ W  # (N*s, m)
        return phi.reshape(S.shape[0], S.shape[1], m).mean(axis=1)

    F1 = mean_feat(S1)  # (N, m)
    F2 = mean_feat(S2)
    d2 = (
        jnp.sum(F1**2, -1)[:, None]
        + jnp.sum(F2**2, -1)[None, :]
        - 2.0 * F1 @ F2.T
    )
    return jnp.exp(-0.5 * jnp.maximum(d2, 0.0) / gamma**2)


class UncertainGPCore(GPCore):
    """GP core whose numeric kernel is the expected-RBF over
    N(x, diag(σ_in²)) inputs (scaled frame)."""

    def __init__(self, *args, input_std: float = 0.05, **kw):
        kw.setdefault("kernel", "rbf")
        super().__init__(*args, **kw)
        self.input_std = input_std

    def gram_points(self, params, X1, X2, data):
        f1 = self.features(params, X1, data)
        f2 = self.features(params, X2, data)
        ls = jnp.exp(params.log_ls[: self.n_feat_dims])
        s_in = jnp.full((self.n_feat_dims,), self.input_std, f1.dtype)
        K = expected_rbf(f1, f2, ls, s_in, s_in)
        return jnp.exp(params.log_sc) * K

    def prior_diag(self, params):
        # E[k(x,x)] under input noise < outputscale: Π ℓ²/(ℓ²+2s²) · sc
        ls2 = jnp.exp(2.0 * params.log_ls[: self.n_feat_dims])
        s2 = self.input_std**2
        return jnp.exp(params.log_sc) * jnp.prod(
            jnp.sqrt(ls2 / (ls2 + 2.0 * s2))
        )


@register_model("uncertain_gp")
class UncertainGP(GP):
    """AIRBO surrogate: expected-RBF GP under Gaussian input noise."""

    def __init__(self, space, num_out: int = 1, **conf):
        super().__init__(space, num_out=num_out, **conf)
        num_cats = [int(space.num_categories[c]) for c in space.cat_dims]
        self.core = UncertainGPCore(
            numeric_dims=tuple(space.numeric_dims) + tuple(space.perm_dims),
            cat_dims=tuple(space.cat_dims),
            num_categories=tuple(num_cats),
            optimizer=conf.get("optimizer", "adam"),
            n_steps=conf.get("num_epochs", 100),
            lr=conf.get("lr", 0.05),
            n_ensemble=conf.get("n_ensemble", 1),
            input_std=conf.get("input_std", 0.05),
        )
        self._fit_jit = {}
        self._pred_jit = {}
