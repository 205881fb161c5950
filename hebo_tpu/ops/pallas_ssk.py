"""Pallas TPU kernel: string-subsequence-kernel (SSK) Gram blocks.

Parity: MCBO ``SubStringKernel`` (models/gp/kernels.py:198, Beck-2017
vectorized DP) / AntBO ``FastStringKernel`` (bo/kernels.py:147) — the BOSS
and AntBO surrogate kernel over operator/CDR3 sequences.

Why a kernel: the einsum form (models/gp/kernels.py:ssk_kernel)
materializes (N, M, L, L) match/DP tensors in HBM — for N=M=512, L=11
that is ~130 MB per DP step per intermediate, so the op is HBM-bandwidth
bound.  Here the DP over subsequence length runs entirely in VMEM on
(TN, TM) pair tiles.

Mosaic-friendly formulation: each pair's (L, L) DP matrix is kept
row-major-flattened in the LANE axis (L² ≈ 128 for the 11-mer antigen
spaces), so the DP step  inner = Dᵀ·Kp·D  becomes ONE (lanes x lanes)
matmul with the precomputed Kronecker matrix  W = D ⊗ D:
``vec(Dᵀ Kp D) = vec(Kp) @ W``.  Tensors never exceed rank 3
(TN, TM, L²) — no 4-D intermediates, MXU-shaped contractions only.

Differentiability: the match/gap decays are LEARNED GP hyperparameters
(fit by pSGLD/Adam through the NLL), so the kernel carries forward-mode
tangents for the two scalars through the DP — (K, ∂K/∂λ_m², ∂K/∂λ_g) come
out of one fused pass — exposed via ``jax.custom_vjp``.  Integer code
inputs need no gradients.

``ssk_gram(..., interpret=True)`` runs the same kernel under the Pallas
interpreter for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ssk_gram"]

# Pair tile aligned to (sublane, lane) = (8, 128); VMEM per DP buffer is
# TN*TM*L^2 floats (~0.5 MB at L=11).
_TN = 8
_TM = 128


def _decay_mats(gap_decay, L: int):
    """Gap transfer matrix D[i,j] = λ_g^{j-i-1} (j > i) and ∂D/∂λ_g."""
    idx = jnp.arange(L)
    p = idx[None, :] - idx[:, None] - 1  # j - i - 1
    D = jnp.where(p >= 0, gap_decay ** jnp.maximum(p, 0), 0.0).astype(jnp.float32)
    dD = jnp.where(
        p >= 1, p * gap_decay ** jnp.maximum(p - 1, 0), 0.0
    ).astype(jnp.float32)
    return D, dD


def _kron_mats(gap_decay, L: int):
    """W = D ⊗ D (row-major vec identity: vec(DᵀKD) = vec(K) @ W) and ∂W/∂λ_g."""
    D, dD = _decay_mats(gap_decay, L)
    W = jnp.kron(D, D)
    dW = jnp.kron(dD, D) + jnp.kron(D, dD)
    return W, dW


def _dp_flat(match, lam2, W, dW, max_subseq: int):
    """DP over flattened pair matrices with forward-mode tangents.

    match: (..., L²) → (total, ∂total/∂λ_m², ∂total/∂λ_g), each (...)."""

    def mm(x, A):
        return jax.lax.dot_general(
            x, A,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    Kp = match * lam2
    Kp_l = match
    Kp_g = jnp.zeros_like(Kp)
    tot = jnp.sum(Kp, axis=-1)
    tot_l = jnp.sum(Kp_l, axis=-1)
    tot_g = jnp.zeros_like(tot)
    for _ in range(1, max_subseq):
        inner = mm(Kp, W)
        inner_l = mm(Kp_l, W)
        inner_g = mm(Kp, dW) + mm(Kp_g, W)
        Kp_l = match * (inner + lam2 * inner_l)
        Kp_g = lam2 * match * inner_g
        Kp = lam2 * match * inner
        tot = tot + jnp.sum(Kp, axis=-1)
        tot_l = tot_l + jnp.sum(Kp_l, axis=-1)
        tot_g = tot_g + jnp.sum(Kp_g, axis=-1)
    return tot, tot_l, tot_g


def _expand_codes(s, L: int):
    """(T, L) codes → (T, L²) with a-index = k // L (row factor)."""
    return jnp.repeat(s, L, axis=1)


def _tile_codes(s, L: int):
    """(T, L) codes → (T, L²) with b-index = k % L (column factor)."""
    return jnp.tile(s, (1, L))


def _cross_kernel(max_subseq, s1e_ref, s2e_ref, W_ref, dW_ref, lam2_ref,
                  k_ref, kl_ref, kg_ref):
    a = s1e_ref[:]  # (TN, L²) row-expanded codes
    b = s2e_ref[:]  # (TM, L²) col-tiled codes
    match = (a[:, None, :] == b[None, :, :]).astype(jnp.float32)  # (TN, TM, L²)
    tot, tot_l, tot_g = _dp_flat(match, lam2_ref[0, 0], W_ref[:], dW_ref[:], max_subseq)
    k_ref[:] = tot
    kl_ref[:] = tot_l
    kg_ref[:] = tot_g


def _self_kernel(max_subseq, se_ref, st_ref, W_ref, dW_ref, lam2_ref,
                 k_ref, kl_ref, kg_ref):
    match = (se_ref[:] == st_ref[:]).astype(jnp.float32)  # (TN, L²)
    tot, tot_l, tot_g = _dp_flat(match, lam2_ref[0, 0], W_ref[:], dW_ref[:], max_subseq)
    k_ref[:] = tot[:, None]
    kl_ref[:] = tot_l[:, None]
    kg_ref[:] = tot_g[:, None]


def _pad_rows(s, tile, fill):
    n = s.shape[0]
    np_ = -(-n // tile) * tile
    return jnp.full((np_, s.shape[1]), fill, jnp.float32).at[:n].set(s), np_


@functools.partial(jax.jit, static_argnames=("max_subseq", "interpret"))
def _raw_call(s1f, s2f, lam2, gap_decay, max_subseq: int, interpret: bool):
    """Raw (unnormalized) cross/self totals + tangents via Pallas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = s1f.shape[1]
    L2 = L * L
    W, dW = _kron_mats(gap_decay, L)
    lam2s = jnp.reshape(lam2, (1, 1)).astype(jnp.float32)
    a, Np = _pad_rows(s1f, _TN, -1.0)
    b, Mp = _pad_rows(s2f, _TM, -2.0)
    a_e, a_t = _expand_codes(a, L), _tile_codes(a, L)
    b_t = _tile_codes(b, L)

    vmem = {} if interpret else dict(memory_space=pltpu.VMEM)

    cross = pl.pallas_call(
        functools.partial(_cross_kernel, max_subseq),
        grid=(Np // _TN, Mp // _TM),
        in_specs=[
            pl.BlockSpec((_TN, L2), lambda i, j: (i, 0), **vmem),
            pl.BlockSpec((_TM, L2), lambda i, j: (j, 0), **vmem),
            pl.BlockSpec((L2, L2), lambda i, j: (0, 0), **vmem),
            pl.BlockSpec((L2, L2), lambda i, j: (0, 0), **vmem),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TN, _TM), lambda i, j: (i, j), **vmem)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((Np, Mp), jnp.float32) for _ in range(3)],
        interpret=interpret,
    )(a_e, b_t, W, dW, lam2s)

    def selfs(se, st, n_pad):
        outs = pl.pallas_call(
            functools.partial(_self_kernel, max_subseq),
            grid=(n_pad // _TN,),
            in_specs=[
                pl.BlockSpec((_TN, L2), lambda i: (i, 0), **vmem),
                pl.BlockSpec((_TN, L2), lambda i: (i, 0), **vmem),
                pl.BlockSpec((L2, L2), lambda i: (0, 0), **vmem),
                pl.BlockSpec((L2, L2), lambda i: (0, 0), **vmem),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((_TN, 1), lambda i: (i, 0), **vmem) for _ in range(3)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, 1), jnp.float32) for _ in range(3)
            ],
            interpret=interpret,
        )(se, st, W, dW, lam2s)
        return [o[:, 0] for o in outs]

    s1_tot = selfs(a_e, a_t, Np)
    b_e = _expand_codes(b, L)
    s2_tot = selfs(b_e, b_t, Mp)
    return cross, s1_tot, s2_tot


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ssk_norm(s1f, s2f, lam2, gap_decay, max_subseq, interpret):
    K, _res = _ssk_norm_fwd(s1f, s2f, lam2, gap_decay, max_subseq, interpret)
    return K


def _ssk_norm_fwd(s1f, s2f, lam2, gap_decay, max_subseq, interpret):
    N, M = s1f.shape[0], s2f.shape[0]
    cross, s1_tot, s2_tot = _raw_call(
        s1f, s2f, lam2, gap_decay, max_subseq, interpret
    )
    c, cl, cg = (t[:N, :M] for t in cross)
    a0, al, ag = (t[:N] for t in s1_tot)
    b0, bl, bg = (t[:M] for t in s2_tot)
    prod = jnp.maximum(a0[:, None] * b0[None, :], 1e-12)
    denom = jnp.sqrt(prod)
    K = c / denom
    # d(c/sqrt(a b)) = dc/denom − (K/2)(da/a + db/b)
    inv_a = 1.0 / jnp.maximum(a0, 1e-12)
    inv_b = 1.0 / jnp.maximum(b0, 1e-12)
    dK_dl = cl / denom - 0.5 * K * (al * inv_a)[:, None] - 0.5 * K * (bl * inv_b)[None, :]
    dK_dg = cg / denom - 0.5 * K * (ag * inv_a)[:, None] - 0.5 * K * (bg * inv_b)[None, :]
    return K, (dK_dl, dK_dg, s1f, s2f)


def _ssk_norm_bwd(max_subseq, interpret, res, g):
    dK_dl, dK_dg, s1f, s2f = res
    return (
        jnp.zeros_like(s1f),  # codes carry no gradient
        jnp.zeros_like(s2f),
        jnp.sum(g * dK_dl),
        jnp.sum(g * dK_dg),
    )


_ssk_norm.defvjp(_ssk_norm_fwd, _ssk_norm_bwd)


def ssk_gram(
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    match_decay,
    gap_decay,
    max_subseq: int = 3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Normalized SSK Gram (N, M) with grads in (match_decay, gap_decay)."""
    s1f = s1.astype(jnp.float32)
    s2f = s2.astype(jnp.float32)
    lam2 = (match_decay * match_decay).astype(jnp.float32)
    return _ssk_norm(s1f, s2f, lam2, gap_decay, max_subseq, interpret)
