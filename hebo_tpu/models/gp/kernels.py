"""GP kernels as pure jnp Gram-matrix functions.

Parity targets (re-derived, not translated):
* Matérn-3/2 / 5/2 / 1/2 + RBF with ARD lengthscales — the reference's main
  surrogate kernel (HEBO/hebo/models/gp/gp_util.py:22-66 ``default_kern``:
  Matérn(xc) × Matérn(embedded xe), ScaleKernel outside).
* Categorical embedding: learned ``(n_cats_total, emb_dim)`` table applied
  as ``one_hot(codes) @ E`` — the reference's ``EmbTransform`` /
  ``DummyFeatureExtractor`` (models/layers.py:7-60, gp_util.py:84-105) as a
  single MXU matmul.
* Combinatorial kernel zoo (MCBO/mcbo/models/gp/kernels.py): ``Overlap``
  (:94), ``TransformedOverlap`` (:127), ``OrdinalKernel`` (:166),
  ``DiffusionKernel`` (:354), ``HEDKernel`` (:637) — all expressed as
  batched one-hot contractions / masked reductions that XLA fuses.

All distance computations use the ‖a-b‖² = ‖a‖² + ‖b‖² - 2a·b expansion so
the O(N²D) work is one MXU matmul instead of a broadcasted subtract.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "sq_dist",
    "matern12",
    "matern32",
    "matern52",
    "rbf",
    "embed_categorical",
    "overlap",
    "transformed_overlap",
    "ordinal_kernel",
    "diffusion_kernel",
    "hed_embed",
    "ssk_kernel",
    "feature_warp_rbf",
    "feature_warp_cosine",
]


def sq_dist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distance, MXU-friendly.

    x1: (N, D), x2: (M, D) → (N, M), clamped at 0 for fp safety.
    """
    n1 = jnp.sum(x1 * x1, axis=-1, keepdims=True)  # (N, 1)
    n2 = jnp.sum(x2 * x2, axis=-1, keepdims=True).T  # (1, M)
    cross = jnp.dot(x1, x2.T, preferred_element_type=x1.dtype)
    return jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)


def _scaled(x: jnp.ndarray, lengthscales: jnp.ndarray) -> jnp.ndarray:
    return x / lengthscales


def matern12(x1, x2, lengthscales):
    d = jnp.sqrt(sq_dist(_scaled(x1, lengthscales), _scaled(x2, lengthscales)) + 1e-16)
    return jnp.exp(-d)


def matern32(x1, x2, lengthscales):
    d = jnp.sqrt(sq_dist(_scaled(x1, lengthscales), _scaled(x2, lengthscales)) + 1e-16)
    s = math.sqrt(3.0) * d
    return (1.0 + s) * jnp.exp(-s)


def matern52(x1, x2, lengthscales):
    d2 = sq_dist(_scaled(x1, lengthscales), _scaled(x2, lengthscales))
    d = jnp.sqrt(d2 + 1e-16)
    s = math.sqrt(5.0) * d
    return (1.0 + s + 5.0 * d2 / 3.0) * jnp.exp(-s)


def rbf(x1, x2, lengthscales):
    d2 = sq_dist(_scaled(x1, lengthscales), _scaled(x2, lengthscales))
    return jnp.exp(-0.5 * d2)


def mlp(x1, x2, lengthscales):
    """MLP (arc-sine) kernel — infinite-width one-hidden-layer network.

    Parity: reference ``GPyMLPGP`` (HEBO/hebo/models/gp/gpy_mlp.py: GPy
    ``MLP`` kernel):  k(x, y) = (2/π) asin( (w·xᵀy + b) /
    sqrt((w·‖x‖²+b+1)(w·‖y‖²+b+1)) ), ARD weight variances w_d = 1/ℓ_d²
    (reusing the GP's per-dim lengthscale parameters), bias variance 1.
    """
    z1 = _scaled(x1, lengthscales)
    z2 = _scaled(x2, lengthscales)
    b = 1.0
    num = jnp.dot(z1, z2.T, preferred_element_type=z1.dtype) + b
    d1 = jnp.sum(z1 * z1, axis=-1, keepdims=True) + b + 1.0  # (N, 1)
    d2 = jnp.sum(z2 * z2, axis=-1, keepdims=True).T + b + 1.0  # (1, M)
    r = jnp.clip(num / jnp.sqrt(d1 * d2), -1.0 + 1e-7, 1.0 - 1e-7)
    return (2.0 / math.pi) * jnp.arcsin(r)


MATERN_FNS = {
    "matern12": matern12, "matern32": matern32, "matern52": matern52,
    "rbf": rbf, "mlp": mlp,
}


def embed_categorical(
    codes: jnp.ndarray, emb_table: jnp.ndarray, cat_offsets: jnp.ndarray,
    num_categories: jnp.ndarray,
) -> jnp.ndarray:
    """Map integer category codes to learned embeddings via one-hot matmul.

    codes: (N, C) float/int codes per categorical column.
    emb_table: (sum_cats, E) learned table (GP hyperparameter).
    cat_offsets: (C,) start row of each column's block in the table.
    num_categories: (C,) cardinalities (for one-hot width = max).

    Returns (N, C*E) concatenated embeddings.  The one-hot contraction is a
    single (N, sum_cats) @ (sum_cats, E) MXU matmul.
    """
    n, c = codes.shape
    total = emb_table.shape[0]
    flat_idx = codes.astype(jnp.int32) + cat_offsets[None, :].astype(jnp.int32)
    onehot = jax.nn.one_hot(flat_idx, total, dtype=emb_table.dtype)  # (N, C, total)
    emb = jnp.einsum("nct,te->nce", onehot, emb_table)
    return emb.reshape(n, -1)


# ------------------------------------------------------- combinatorial zoo
def overlap(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Category-agreement (Hamming similarity) kernel.

    Parity: MCBO ``Overlap`` (models/gp/kernels.py:94).
    x: (N, C) integer codes → mean agreement in [0, 1].
    """
    agree = (x1[:, None, :] == x2[None, :, :]).astype(jnp.float32)
    return jnp.mean(agree, axis=-1)


def transformed_overlap(
    x1: jnp.ndarray, x2: jnp.ndarray, lengthscales: jnp.ndarray
) -> jnp.ndarray:
    """exp of per-dimension-scaled agreement.

    Parity: MCBO ``TransformedOverlap`` (models/gp/kernels.py:127):
    k = exp( mean_d θ_d · 1[x1_d == x2_d] ), normalized to k(x,x)=1.
    """
    agree = (x1[:, None, :] == x2[None, :, :]).astype(lengthscales.dtype)
    s = jnp.mean(agree * lengthscales[None, None, :], axis=-1)
    s_max = jnp.mean(lengthscales)
    return jnp.exp(s - s_max)


def conditional_transformed_overlap(
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    group_grams: jnp.ndarray,
    cat_to_group: jnp.ndarray,
    lam: jnp.ndarray,
) -> jnp.ndarray:
    """Conditional (hierarchical) transformed-overlap kernel.

    Parity: MCBO ``ConditionalTransformedOverlapKernel``
    (models/gp/kernels.py:410-560): per sequence dimension d the
    similarity is 0 on a category mismatch, 1 on a match whose category
    has no hyperparameters, and K^{H_c}(params, params') — the matched
    category's hyperparameter-kernel gram — otherwise; the per-dim
    similarities are ARD-weighted, averaged and exponentiated.  Unlike
    the reference (which leaves the scale to gpytorch's ScaleKernel) the
    result is normalized so k(x, x) = 1, matching this module's
    ``transformed_overlap`` convention.

    c1 (N1, C), c2 (N2, C): integer category codes per sequence dim;
    group_grams (G, N1, N2): normalized hyperparameter-kernel grams, one
    per category group; cat_to_group (n_cats,): group index per category
    or -1 for categories without hyperparameters; lam (C,): positive ARD
    weights.
    """
    N1, C = c1.shape
    N2 = c2.shape[0]
    c1i = c1.astype(jnp.int32)
    match = c1i[:, None, :] == c2.astype(jnp.int32)[None, :, :]  # (N1,N2,C)
    g = cat_to_group[c1i]  # (N1, C); valid wherever match holds
    gsafe = jnp.maximum(g, 0)
    moved = jnp.moveaxis(group_grams, 0, -1)  # (N1, N2, G)
    picked = jnp.take_along_axis(
        moved, jnp.broadcast_to(gsafe[:, None, :], (N1, N2, C)), axis=-1
    )  # (N1, N2, C)
    has_hyp = (g >= 0)[:, None, :]
    sim = jnp.where(match, jnp.where(has_hyp, picked, 1.0), 0.0)
    s = jnp.sum(sim * lam[None, None, :], axis=-1) / jnp.maximum(
        jnp.sum(lam), 1e-12
    )
    return jnp.exp(s - 1.0)


def ordinal_kernel(x1, x2, lengthscales, num_values):
    """Normalized absolute-difference kernel for ordinal codes.

    Parity: MCBO ``OrdinalKernel`` (models/gp/kernels.py:166).
    """
    diff = jnp.abs(x1[:, None, :] - x2[None, :, :]) / jnp.maximum(
        num_values[None, None, :] - 1.0, 1.0
    )
    s = jnp.mean((1.0 - diff) * lengthscales[None, None, :], axis=-1)
    return jnp.exp(s - jnp.mean(lengthscales))


def diffusion_kernel(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    betas: jnp.ndarray,
    num_categories: jnp.ndarray,
) -> jnp.ndarray:
    """Graph-diffusion kernel on the complete graph per categorical dim.

    Parity: MCBO ``DiffusionKernel`` (models/gp/kernels.py:354) specialised
    to the complete-graph Laplacian whose eigenexpansion has the closed
    form used by COMBO:  per dim with cardinality c and decay β:
      k(a, b) = (1 - e^{-cβ}) / (1 + (c-1) e^{-cβ})   if a ≠ b
                1                                      if a = b
    (up to normalization), multiplied over dims.
    """
    c = num_categories.astype(x2.dtype if x2.dtype != jnp.int32 else jnp.float32)
    e = jnp.exp(-c * betas)  # (C,)
    same_val = (1.0 + (c - 1.0) * e) / (1.0 + (c - 1.0) * e)  # = 1
    diff_val = (1.0 - e) / (1.0 + (c - 1.0) * e)
    agree = x1[:, None, :] == x2[None, :, :]
    per_dim = jnp.where(agree, same_val[None, None, :], diff_val[None, None, :])
    return jnp.prod(per_dim, axis=-1)


def ssk_kernel(
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    match_decay,
    gap_decay,
    max_subseq: int = 3,
) -> jnp.ndarray:
    """Normalized string-subsequence kernel as batched MXU matmuls.

    Parity: MCBO ``SubStringKernel`` (models/gp/kernels.py:198, Beck-2017
    vectorized DP) and AntBO ``FastStringKernel`` (bo/kernels.py:147).

    The DP over subsequence length p uses the gap-decay transfer matrix
    D[i, j] = λ_g^{j-i-1} (j > i), so each step is two (L × L) matmuls per
    sequence pair — the whole (N, M) block runs as one einsum per step.

    s1: (N, L), s2: (M, L) integer codes → (N, M) kernel in [0, 1].
    """
    L = s1.shape[1]
    lam_m2 = match_decay * match_decay
    idx = jnp.arange(L)
    powers = idx[None, :] - idx[:, None] - 1  # j - i - 1
    D = jnp.where(powers >= 0, gap_decay ** jnp.maximum(powers, 0), 0.0).astype(
        jnp.float32
    )

    def raw(a, b):
        # a: (..., L), b: (..., L) broadcast match matrix (..., L, L)
        match = (a[..., :, None] == b[..., None, :]).astype(jnp.float32)
        Kp = match * lam_m2
        total = jnp.sum(Kp, axis=(-2, -1))
        for _ in range(1, max_subseq):
            inner = jnp.einsum("ij,...jk,kl->...il", D.T, Kp, D)
            Kp = lam_m2 * match * inner
            total = total + jnp.sum(Kp, axis=(-2, -1))
        return total

    cross = raw(s1[:, None, :], s2[None, :, :])  # (N, M)
    self1 = raw(s1, s1)  # (N,)
    self2 = raw(s2, s2)  # (M,)
    denom = jnp.sqrt(jnp.maximum(self1[:, None] * self2[None, :], 1e-12))
    return cross / denom


def hed_embed(
    codes: jnp.ndarray,
    dictionary: jnp.ndarray,
) -> jnp.ndarray:
    """Hamming embedding via dictionary (HED).

    Parity: MCBO ``HEDKernel`` (models/gp/kernels.py:637): embed a point as
    its Hamming similarity to ``m`` random dictionary anchors; downstream a
    numeric kernel (Matérn/RBF) acts on the embedding.

    codes: (N, C); dictionary: (m, C) → (N, m) similarities.
    """
    agree = (codes[:, None, :] == dictionary[None, :, :]).astype(jnp.float32)
    return jnp.mean(agree, axis=-1)


def feature_warp_rbf(
    idx1: jnp.ndarray,
    idx2: jnp.ndarray,
    feature_table: jnp.ndarray,
    lengthscales: jnp.ndarray,
) -> jnp.ndarray:
    """RBF over precomputed per-candidate feature embeddings.

    Parity: AntBO ``BERTWarpRBF`` (bo/kernels.py:297-307) — sequences are
    warped through frozen language-model features before a standard RBF.
    TPU-native form: the warp is a gather from a precomputed ``(table_size,
    feat_dim)`` feature table (AntBO's ``table_of_candidates`` embeddings,
    bo/optimizer.py:36-120), so the kernel is one gather + one MXU matmul.

    idx1: (N,) int candidate indices; idx2: (M,); → (N, M).
    """
    f1 = feature_table[idx1.astype(jnp.int32)]
    f2 = feature_table[idx2.astype(jnp.int32)]
    return rbf(f1, f2, lengthscales)


def feature_warp_cosine(
    idx1: jnp.ndarray,
    idx2: jnp.ndarray,
    feature_table: jnp.ndarray,
) -> jnp.ndarray:
    """Cosine-similarity kernel over precomputed feature embeddings.

    Parity: AntBO ``BERTWarpCosine`` (bo/kernels.py:297-307).  Normalized
    dot product in feature space; one gather + one matmul on the MXU.
    """
    f1 = feature_table[idx1.astype(jnp.int32)]
    f2 = feature_table[idx2.astype(jnp.int32)]
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(f1 * f1, axis=-1, keepdims=True), 1e-12))
    n2 = jnp.sqrt(jnp.maximum(jnp.sum(f2 * f2, axis=-1, keepdims=True), 1e-12))
    return (f1 / n1) @ (f2 / n2).T
