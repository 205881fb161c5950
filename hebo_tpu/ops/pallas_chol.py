"""Pallas batched blocked Cholesky (+ fused triangular inverse) for TPU.

XLA's ``CholeskyExpander`` lowers ``jnp.linalg.cholesky`` to a blocked
HLO algorithm whose unblocked inner step is a *While loop of rank-1
updates* — on TPU every iteration is a separate tiny HLO op with loop
overhead, so a 1024×1024 factorization is latency-bound far below both
the MXU and HBM rooflines (measured ~0.46 ms/matrix at (16,1024,1024),
~19% of HBM peak; experiments/chol_probe.json).  Triangular solves have
the same expander problem, and the autodiff backward of the NLL chains
several of each.

This kernel keeps the irreducible serial column recurrence inside one
Mosaic kernel where an iteration is a handful of VPU ops with no HLO
loop overhead, and exploits two structural facts:

  * the trailing submatrix stays **symmetric** throughout, so "column k
    below the pivot" can be read as a cheap sublane-dynamic **row**
    slice — no lane gathers, no mask-reduce extraction;
  * the O(N³) work (panel solve, trailing update, blocked inverse
    assembly) is clean 128-wide MXU matmuls against the per-panel
    128×128 inverse the diagonal loop produces anyway.

Optionally the kernel also emits ``W = L⁻¹`` (``chol_inv_batched``):
the diagonal-block inverses are combined with K(K−1)/2 MXU matmuls into
the full triangular inverse, after which *every* downstream solve
(NLL quadratic form, posterior cache, K⁻¹ for the analytic NLL
gradient) is a matmul instead of an expander-serial TriangularSolve.

Inputs/outputs stay in HBM (``memory_space=ANY``); each grid step DMAs
a chunk of BC matrices into VMEM scratch, factorizes in place, and DMAs
out (v5e scoped-vmem limit is 16 MB).  BC amortizes the serial loop
across the restart/chain batch axis.

Failure semantics match ``jnp.linalg.cholesky``: a non-PSD input yields
NaNs in the factor (rsqrt of a negative propagates), so the in-graph
jitter ladder (ops/chol.py) detects it exactly as before.

Reference parity note: the reference delegates this math to
torch/LAPACK (HEBO/hebo/models/gp/gp.py:103-126 wraps
``psd_safe_cholesky``); on TPU the factorization itself is the hot
kernel and is owned here (SURVEY §2.8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "cholesky_batched",
    "chol_inv_batched",
    "pallas_chol_supported",
]

BLK = 128


def pallas_chol_supported(n: int) -> bool:
    """Shapes the kernel handles (pad buckets are powers of two, so in
    practice 128/256/512/1024)."""
    return n % BLK == 0 and BLK <= n <= 1024


def _chunk_rows(n: int, with_inverse: bool) -> int:
    """Matrices per grid step: the (BC,N,N) scratches (1 or 2 of them)
    plus the widest (BC,N,128) temporaries must fit in ~12 MB of VMEM."""
    mats = 2 if with_inverse else 1
    budget = 11 * 1024 * 1024
    per = mats * n * n * 4 + 6 * n * BLK * 4 + 4 * BLK * BLK * 4
    return max(1, budget // per)


def _bmm_t(a, b):
    """(BC, M, K) @ (BC, N, K)ᵀ → (BC, M, N) on the MXU (f32 path)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bmm(a, b):
    """(BC, M, K) @ (BC, K, N) → (BC, M, N) on the MXU (f32 path)."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _diag_factor_inverse(d_ref, lt_ref, w_ref, n_bc):
    """Factor the (BC,128,128) diagonal block in ``d_ref`` (symmetric),
    writing Lᵀ rows into ``lt_ref`` and W = L⁻¹ into ``w_ref``.

    Sublane-dynamic row slices replace lane gathers: the trailing block
    of D stays symmetric under the rank-1 updates, so column k below
    the pivot IS row k right of the pivot.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BLK), 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, BLK, 1), 1)
    # W starts as I; rows ≥ k updated in place by forward substitution
    eye = (jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1))
    w_ref[:] = jnp.broadcast_to(eye.astype(jnp.float32), (n_bc, BLK, BLK))

    def step(k, _):
        row = d_ref[:, pl.ds(k, 1), :]  # (BC,1,128) — row k == col k (sym)
        d = jnp.sum(jnp.where(lane == k, row, 0.0), axis=2, keepdims=True)
        inv = jax.lax.rsqrt(d)
        col = jnp.where(lane >= k, row * inv, 0.0)  # L[:,k] as a lane vector
        lt_ref[:, pl.ds(k, 1), :] = col
        col_t = jnp.transpose(col, (0, 2, 1))  # (BC,128,1)
        # rank-1 trailing update (columns > k; rows < k are junk but col_t
        # is 0 there so they stay untouched)
        d_ref[:] = d_ref[:] - (col_t * col) * (lane > k)
        # forward substitution for W = L⁻¹: wrow = residual row k / d
        wrow = w_ref[:, pl.ds(k, 1), :] * inv
        w_ref[:, pl.ds(k, 1), :] = wrow
        colb = jnp.where(rows > k, col_t, 0.0)
        w_ref[:] = w_ref[:] - colb * wrow
        return 0

    jax.lax.fori_loop(0, BLK, step, 0)


def _chol_kernel(
    a_ref, o_ref, *rest, n: int, n_bc: int, with_inverse: bool
):
    if with_inverse:
        (w_out_ref, s_ref, wf_ref, wd_ref, d_ref, lt_ref, wb_ref,
         sem) = rest
    else:
        (s_ref, wd_ref, d_ref, lt_ref, wb_ref, sem) = rest
        wf_ref = w_out_ref = None
    i = pl.program_id(0)
    cp_in = pltpu.make_async_copy(a_ref.at[pl.ds(i * n_bc, n_bc)], s_ref, sem)
    cp_in.start()
    cp_in.wait()
    kp = n // BLK
    rows_col = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    for j in range(kp):
        c0 = j * BLK
        d_ref[:] = s_ref[:, c0 : c0 + BLK, c0 : c0 + BLK]
        _diag_factor_inverse(d_ref, lt_ref, wb_ref, n_bc)
        Wd = wb_ref[:]
        wd_ref[:, j] = Wd  # keep for the blocked-inverse phase
        # panel solve on the MXU: full-height column slab against Wdᵀ
        P = _bmm_t(s_ref[:, :, c0 : c0 + BLK], Wd)  # (BC, N, BLK)
        Pb = jnp.where(rows_col >= c0 + BLK, P, 0.0)
        # L column slab: 0 above, Ld on the diagonal block, P below
        s_ref[:, :, c0 : c0 + BLK] = Pb
        s_ref[:, c0 : c0 + BLK, c0 : c0 + BLK] = jnp.transpose(
            lt_ref[:], (0, 2, 1)
        )
        # trailing update, one 128-slab at a time (temps stay small)
        for m in range(j + 1, kp):
            c1 = m * BLK
            T = _bmm_t(Pb, Pb[:, c1 : c1 + BLK, :])  # (BC, N, BLK)
            s_ref[:, :, c1 : c1 + BLK] = s_ref[:, :, c1 : c1 + BLK] - T

    cp_out = pltpu.make_async_copy(s_ref, o_ref.at[pl.ds(i * n_bc, n_bc)], sem)
    cp_out.start()
    cp_out.wait()

    if with_inverse:
        # blocked triangular inverse: W[i,j] = -Wd_i · Σ_k L[i,k]·W[k,j]
        for j in range(kp):
            cj = j * BLK
            wf_ref[:, cj : cj + BLK, cj : cj + BLK] = wd_ref[:, j]
            zero = jnp.zeros((n_bc, BLK, BLK), jnp.float32)
            for i2 in range(j + 1, kp):
                ci = i2 * BLK
                acc = zero
                for k2 in range(j, i2):
                    ck = k2 * BLK
                    acc = acc + _bmm(
                        s_ref[:, ci : ci + BLK, ck : ck + BLK],
                        wf_ref[:, ck : ck + BLK, cj : cj + BLK],
                    )
                wf_ref[:, ci : ci + BLK, cj : cj + BLK] = -_bmm(
                    wd_ref[:, i2], acc
                )
            # zero the strictly-upper block column of W
            for i2 in range(j):
                ci = i2 * BLK
                wf_ref[:, ci : ci + BLK, cj : cj + BLK] = zero
        cp_w = pltpu.make_async_copy(
            wf_ref, w_out_ref.at[pl.ds(i * n_bc, n_bc)], sem
        )
        cp_w.start()
        cp_w.wait()


def _run(K: jnp.ndarray, with_inverse: bool, interpret: bool):
    B, n, n2 = K.shape
    assert n == n2 and pallas_chol_supported(n), (B, n, n2)
    bc = min(_chunk_rows(n, with_inverse), B)
    Bp = -(-B // bc) * bc
    if Bp != B:
        K = jnp.concatenate(
            [K, jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (Bp - B, n, n))],
            axis=0,
        )
    kp = n // BLK
    out_shape = [jax.ShapeDtypeStruct((Bp, n, n), jnp.float32)]
    if with_inverse:
        out_shape.append(jax.ShapeDtypeStruct((Bp, n, n), jnp.float32))
    scratch = [pltpu.VMEM((bc, n, n), jnp.float32)]
    if with_inverse:
        scratch.append(pltpu.VMEM((bc, n, n), jnp.float32))
    scratch += [
        pltpu.VMEM((bc, kp, BLK, BLK), jnp.float32),  # per-panel inverses
        pltpu.VMEM((bc, BLK, BLK), jnp.float32),      # diag block
        pltpu.VMEM((bc, BLK, BLK), jnp.float32),      # Lᵀ rows
        pltpu.VMEM((bc, BLK, BLK), jnp.float32),      # W work block
        pltpu.SemaphoreType.DMA,
    ]
    res = pl.pallas_call(
        partial(_chol_kernel, n=n, n_bc=bc, with_inverse=with_inverse),
        grid=(Bp // bc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(K.astype(jnp.float32))
    if with_inverse:
        return res[0][:B], res[1][:B]
    return res[0][:B]


@partial(jax.jit, static_argnames=("interpret",))
def cholesky_batched(K: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Lower Cholesky factor of a batch of SPD matrices, (B, N, N) f32."""
    return _run(K, with_inverse=False, interpret=interpret)


@partial(jax.jit, static_argnames=("interpret",))
def chol_inv_batched(K: jnp.ndarray, interpret: bool = False):
    """(L, W) with K = L Lᵀ and W = L⁻¹, each (B, N, N) f32.

    With W in hand every downstream solve is a matmul:
    K⁻¹ b = Wᵀ (W b), log|K| = 2 Σ log diag L."""
    return _run(K, with_inverse=True, interpret=interpret)
