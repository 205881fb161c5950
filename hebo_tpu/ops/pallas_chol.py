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
    "chol_inv_slab",
    "slab_supported",
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


# --------------------------------------------------------------------------
# HBM-slab variant (round 4): in-kernel batch vectorization at every N.
#
# The r3 kernel above keeps whole (bc, N, N) matrices in VMEM, which caps
# bc at 1 for N=1024 — it then executes B·N serial chain steps and loses
# to the XLA expander (ROOFLINE.md §1, pallas_chol_results.json).  The
# slab variant keeps the matrices in HBM and walks a LEFT-LOOKING blocked
# factorization one 128-wide column panel at a time:
#
#   for panel j:  C ← A[:, :, jB]                       (DMA in, N×128)
#                 C ← C − Σ_{k<j} Lₖ · (Lₖ rows at j)ᵀ   (stream Lₖ, MXU)
#                 factor C[jB:jB+128] serially           (the N-deep chain,
#                                                         batched over bc)
#                 panel solve C·Wdᵀ on the MXU, write L panel (DMA out)
#
# VMEM holds only (bc, N, 128) slabs, so bc≈6 matrices ride each grid
# step at N=1024 and the serial pivot chain is amortized across them —
# the ~7× per-column headroom ROOFLINE.md measured behind the expander.
# Left-looking (vs right-looking) makes every streamed panel write-once/
# read-many: panel k is final when written, so the only RAW hazard is the
# wait on its own out-DMA.
#
# A second kernel assembles W = L⁻¹ by blocked forward substitution
# (pure MXU matmuls, no serial chain), so the analytic-NLL backward's
# TriangularSolve(L, I) — 4 ms of the 17 ms grad step at (1024, 16) —
# becomes a batched matmul (ops/chol.make_masked_nll_batched).
# --------------------------------------------------------------------------

SLAB_MAX_N = 4096


def slab_supported(n: int) -> bool:
    return n % BLK == 0 and BLK <= n <= SLAB_MAX_N


# v5e VMEM is ~128 MB/core; the 16 MB figure is only the compiler's
# default *scoped* limit (probed empirically: 110 MB scratch compiles and
# runs).  Budget 96 MB so the whole fit batch rides ONE grid step at the
# product shapes (bc_res=16 at N=1024 — a 13-matrix cap split B=16 into
# two serial chain walks and cost ~1.8x at (1024,16)).
_VMEM_BUDGET_MB = 96.0
_VMEM_LIMIT = int(112 * 1024 * 1024)


MB = 8  # micro-block rows (f32 sublane granularity)


def _slab_bc(n: int, resident: bool, budget_mb: float = _VMEM_BUDGET_MB) -> int:
    """Matrices per grid step.  ``resident``: the whole (bc, N, N) factor
    lives in VMEM (no stream DMA at all); otherwise only (N, 128) slabs
    do.  Counts ~2 (N,128) kernel-body temporaries — they occupy VMEM
    too (a 16 MB budget OOM'd on exactly this)."""
    if resident:
        per = (n * n + 3 * n * BLK + 6 * BLK * BLK) * 4
    else:
        per = (4 * n * BLK + 6 * BLK * BLK) * 4
    return max(1, int(budget_mb * 1024 * 1024) // per)


def _diag_factor_inverse_mb(d_ref, lt_ref, wb_ref, bc):
    """Micro-blocked 128×128 diagonal-block factorization + inverse.

    The r3 kernel's serial step did TWO (bc,128,128) VPU updates per
    column — ~2 ms of pure VPU work per (16,1024) batch, the measured
    bottleneck once the batch is in-kernel.  LAPACK-style micro-blocking
    fixes the asymptotics: the serial rank-1 updates touch only an
    8-row (bc, 8, 128) strip, and everything crossing strip boundaries
    is ONE MXU contraction per strip (left-looking).  Phase 2 assembles
    W = L⁻¹ of the block by the same strip-wise forward substitution.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BLK), 2)
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, MB, 1), 1)
    pv = jnp.zeros((bc, 1, BLK), jnp.float32)  # pivot inverses, by lane

    def _mx(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    for s in range(BLK // MB):
        r0 = s * MB
        strip = d_ref[:, r0 : r0 + MB, :]
        if s:
            # pending updates from finished columns, on the MXU:
            # M[u,c] = Σ_{k'<r0} L[r0+u,k']·L[c,k']  (lt rows ARE L cols)
            strip = strip - _mx(
                lt_ref[:, 0:r0, r0 : r0 + MB], lt_ref[:, 0:r0, :]
            )

        def p1_step(t, carry, _r0=r0):
            strip, pv = carry
            k = _r0 + t
            # Mosaic has no dynamic_slice on VALUES — masked 8-row reduce
            row = jnp.sum(
                jnp.where(srow == t, strip, 0.0), axis=1, keepdims=True
            )
            dkk = jnp.sum(
                jnp.where(lane == k, row, 0.0), axis=2, keepdims=True
            )
            inv = jax.lax.rsqrt(dkk)
            pv = pv + jnp.where(lane == k, inv, 0.0)
            col = jnp.where(lane >= k, row * inv, 0.0)  # L[:,k] by lane
            lt_ref[:, pl.ds(k, 1), :] = col
            colr = jnp.swapaxes(col[:, :, _r0 : _r0 + MB], 1, 2)  # (bc,8,1)
            strip = strip - (colr * col) * ((lane > k) & (srow > t))
            return strip, pv

        _, pv = jax.lax.fori_loop(0, MB, p1_step, (strip, pv))
    # phase 2: W = L⁻¹ rows, strip by strip
    eyeb = (
        jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    ).astype(jnp.float32)
    for s in range(BLK // MB):
        r0 = s * MB
        X = jnp.broadcast_to(eyeb[r0 : r0 + MB, :], (bc, MB, BLK))
        if s:
            X = X - _mx(lt_ref[:, 0:r0, r0 : r0 + MB], wb_ref[:, 0:r0, :])

        def p2_step(t, X, _r0=r0):
            k = _r0 + t
            invk = jnp.sum(
                jnp.where(lane == k, pv, 0.0), axis=2, keepdims=True
            )
            xrow = (
                jnp.sum(jnp.where(srow == t, X, 0.0), axis=1, keepdims=True)
                * invk
            )
            colr = jnp.swapaxes(
                lt_ref[:, pl.ds(k, 1), _r0 : _r0 + MB], 1, 2
            )
            return jnp.where(
                srow == t, xrow, X - (colr * xrow) * (srow > t)
            )

        X = jax.lax.fori_loop(0, MB, p2_step, X)
        wb_ref[:, r0 : r0 + MB, :] = X


def _diag_factor_inverse_merged(d_ref, lt_ref, wb_ref, bc):
    """Merged micro-blocked factor + inverse of the (bc,128,128) diagonal
    block (r5 slab stage 2, VERDICT r4 next #2).

    The r4 ``_diag_factor_inverse_mb`` ran TWO serial passes over the
    block — 128 factorization steps (phase 1) then 128 forward-
    substitution steps for W = L⁻¹ (phase 2) — so a 1024-bucket
    factorization walked 2048 dependent steps.  Each column step here
    produces BOTH its L column and its W row, halving the serial chain
    to 128 steps/block.  The cross-strip pending terms become standard
    lane-contracting MXU matmuls: the strip's L rows in lane-k layout
    are ONE (128×8) transpose of the Lᵀ lane slice (the r4 version's
    sublane-contracting ``dot_general`` forced Mosaic operand
    transposes on every strip — ROOFLINE.md §5's "transposed lane-slice
    MXU operands" residual).  ``lt_ref`` is zero-initialized so the
    not-yet-written rows contribute exact zeros to those contractions.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BLK), 2)
    srow = jax.lax.broadcasted_iota(jnp.int32, (1, MB, 1), 1)
    eyeb = (
        jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    ).astype(jnp.float32)
    lt_ref[:] = jnp.zeros((bc, BLK, BLK), jnp.float32)
    wb_ref[:] = jnp.zeros((bc, BLK, BLK), jnp.float32)

    def _mx(a, b):
        # (bc, MB, K) @ (bc, K, BLK): contract lanes of a with sublanes
        # of b — the MXU-canonical orientation, no operand transposes
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    for s in range(BLK // MB):
        r0 = s * MB
        strip = d_ref[:, r0 : r0 + MB, :]
        X = jnp.broadcast_to(eyeb[r0 : r0 + MB, :], (bc, MB, BLK))
        if s:
            # L rows of this strip over finished columns, lane-k layout
            lr_strip = jnp.swapaxes(lt_ref[:, :, r0 : r0 + MB], 1, 2)
            strip = strip - _mx(lr_strip, lt_ref[:])
            X = X - _mx(lr_strip, wb_ref[:])
        ltacc = jnp.zeros((bc, MB, BLK), jnp.float32)

        def mstep(t, carry, _r0=r0):
            strip, X, ltacc = carry
            k = _r0 + t
            row = jnp.sum(
                jnp.where(srow == t, strip, 0.0), axis=1, keepdims=True
            )
            dkk = jnp.sum(
                jnp.where(lane == k, row, 0.0), axis=2, keepdims=True
            )
            inv = jax.lax.rsqrt(dkk)
            col = jnp.where(lane >= k, row * inv, 0.0)  # L[:,k] by lane
            ltacc = jnp.where(srow == t, col, ltacc)
            colr = jnp.swapaxes(col[:, :, _r0 : _r0 + MB], 1, 2)  # (bc,MB,1)
            strip = strip - (colr * col) * ((lane > k) & (srow > t))
            xrow = (
                jnp.sum(jnp.where(srow == t, X, 0.0), axis=1, keepdims=True)
                * inv
            )
            X = jnp.where(srow == t, xrow, X - (colr * xrow) * (srow > t))
            return strip, X, ltacc

        _, X, ltacc = jax.lax.fori_loop(0, MB, mstep, (strip, X, ltacc))
        lt_ref[:, r0 : r0 + MB, :] = ltacc
        wb_ref[:, r0 : r0 + MB, :] = X


def _factor_slab_kernel(
    a_ref, l_ref, wd_ref, c_ref, lbuf_ref, d_ref, lt_ref, wb_ref, sem,
    *, n: int, bc: int, kp: int, resident: bool, micro: int,
):
    i = pl.program_id(0)
    b0 = i * bc
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    for j in range(kp):
        c0 = j * BLK
        cp = pltpu.make_async_copy(
            a_ref.at[pl.ds(b0, bc), :, pl.ds(c0, BLK)], c_ref, sem
        )
        cp.start()
        cp.wait()
        # left-looking update: C -= Σ_{k<j} L_k · (L_k rows at j)ᵀ
        for k in range(j):
            if resident:
                Lk = lbuf_ref[:, :, k * BLK : (k + 1) * BLK]
            else:
                cpk = pltpu.make_async_copy(
                    l_ref.at[pl.ds(b0, bc), :, pl.ds(k * BLK, BLK)],
                    lbuf_ref, sem,
                )
                cpk.start()
                cpk.wait()
                Lk = lbuf_ref[:]
            c_ref[:] = c_ref[:] - _bmm_t(Lk, Lk[:, c0 : c0 + BLK, :])
        # serial diagonal factorization (micro-blocked), batched over bc
        d_ref[:] = c_ref[:, c0 : c0 + BLK, :]
        if micro == 2:
            _diag_factor_inverse_merged(d_ref, lt_ref, wb_ref, bc)
        elif micro == 1:
            _diag_factor_inverse_mb(d_ref, lt_ref, wb_ref, bc)
        else:
            _diag_factor_inverse(d_ref, lt_ref, wb_ref, bc)
        cpw = pltpu.make_async_copy(wb_ref, wd_ref.at[pl.ds(b0, bc), j], sem)
        cpw.start()
        # panel solve on the MXU; zero above the diagonal block
        P = _bmm_t(c_ref[:], wb_ref[:])  # (bc, N, 128)
        c_ref[:] = jnp.where(rows >= c0 + BLK, P, 0.0)
        c_ref[:, c0 : c0 + BLK, :] = jnp.transpose(lt_ref[:], (0, 2, 1))
        if resident:
            lbuf_ref[:, :, c0 : c0 + BLK] = c_ref[:]
        cpw.wait()
        cpo = pltpu.make_async_copy(
            c_ref, l_ref.at[pl.ds(b0, bc), :, pl.ds(c0, BLK)], sem
        )
        cpo.start()
        cpo.wait()  # c_ref is overwritten next panel (and read back at
        # j+1 in streaming mode) — the write must land first


def _winv_tile_kernel(
    l_ref, wd_ref, w_ref, wcol_ref, lbuf_ref, wdv_ref, sem,
    *, n: int, bc: int, kp: int,
):
    """Resident-mode W = L⁻¹ by tile-wise blocked forward substitution
    (r5 stage 2).  The v1 column-slab kernel accumulated contributions
    with FULL-HEIGHT (bc, N, 128) masked adds — ~73 VPU passes over an
    8 MB buffer per block column at N=1024, measured ~4 ms at (16, 1024)
    (slab_stage2.json winv_ms; the r4 slab_probe chains fed only L back
    so XLA dead-code-eliminated the winv call and the cost went
    unnoticed).  Here every operation is a (bc, 128, 128) tile matmul:
    W[i,j] = -Wd_i · Σ_{j≤k<i} L[i,k]·W[k,j], with the needed W[k,j]
    tiles already in the column buffer.  kp³/6 + O(kp²) MXU tile
    matmuls, no full-height masks."""
    i = pl.program_id(0)
    b0 = i * bc
    cpd = pltpu.make_async_copy(wd_ref.at[pl.ds(b0, bc)], wdv_ref, sem)
    cpd.start()
    cpl = pltpu.make_async_copy(l_ref.at[pl.ds(b0, bc)], lbuf_ref, sem)
    cpl.start()
    cpl.wait()
    cpd.wait()
    zero = jnp.zeros((bc, BLK, BLK), jnp.float32)

    for j in range(kp):
        cj = j * BLK
        for i2 in range(j):  # strictly-upper tiles of this block column
            wcol_ref[:, i2 * BLK : (i2 + 1) * BLK, :] = zero
        wcol_ref[:, cj : cj + BLK, :] = wdv_ref[:, j]
        for i2 in range(j + 1, kp):
            ci = i2 * BLK
            acc = zero
            for k in range(j, i2):
                ck = k * BLK
                acc = acc + _bmm(
                    lbuf_ref[:, ci : ci + BLK, ck : ck + BLK],
                    wcol_ref[:, ck : ck + BLK, :],
                )
            wcol_ref[:, ci : ci + BLK, :] = -_bmm(wdv_ref[:, i2], acc)
        cpo = pltpu.make_async_copy(
            wcol_ref, w_ref.at[pl.ds(b0, bc), :, pl.ds(cj, BLK)], sem
        )
        cpo.start()
        cpo.wait()


def _balanced_bc(B: int, bc_max: int) -> int:
    """Split B into equal chunks ≤ bc_max (avoids identity-padding a
    whole extra chunk: B=16 with bc_max=13 → two chunks of 8, not
    13 + 13 with 10 padded matrices)."""
    steps = -(-B // bc_max)
    return -(-B // steps)


def _run_slab(K: jnp.ndarray, interpret: bool, micro=None, resident=None):
    import os

    B, n, n2 = K.shape
    assert n == n2 and slab_supported(n), (B, n, n2)
    kp = n // BLK
    bc_res = _slab_bc(n, resident=True)
    if resident is None:
        mode = os.environ.get("HEBO_SLAB_RESIDENT", "auto")
        if mode == "auto":
            # resident only when ONE grid step covers the whole batch —
            # otherwise streaming mode packs ~2x the matrices per step
            # (VMEM holds (bc,N,128) slabs, not (bc,N,N) factors), which
            # HALVES the number of serial chain walks: at (64,1024)
            # resident runs 4 chain walks of bc=16, streaming runs 2 of
            # bc=32, and the serial chain dominates (ROOFLINE §5)
            resident = bc_res >= B
        else:
            resident = mode == "1"
    if micro is None:
        micro = int(os.environ.get("HEBO_SLAB_MICRO", "2"))
    bc = _balanced_bc(B, bc_res if resident else _slab_bc(n, resident=False))
    Bp = -(-B // bc) * bc
    if Bp != B:
        K = jnp.concatenate(
            [K, jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (Bp - B, n, n))],
            axis=0,
        )
    L, Wd = _run_factor(K, bc, kp, resident, micro, interpret)
    W = _run_winv(L, Wd, bc_res, resident, interpret)
    return L[:B], W[:B]


def _run_factor(K, bc, kp, resident, micro, interpret):
    Bp, n, _ = K.shape
    lbuf_shape = (bc, n, n) if resident else (bc, n, BLK)
    L, Wd = pl.pallas_call(
        partial(
            _factor_slab_kernel, n=n, bc=bc, kp=kp, resident=resident,
            micro=micro,
        ),
        grid=(Bp // bc,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
            jax.ShapeDtypeStruct((Bp, kp, BLK, BLK), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bc, n, BLK), jnp.float32),   # C panel
            pltpu.VMEM(lbuf_shape, jnp.float32),     # resident L / stream buf
            pltpu.VMEM((bc, BLK, BLK), jnp.float32),  # diag block
            pltpu.VMEM((bc, BLK, BLK), jnp.float32),  # Lᵀ rows
            pltpu.VMEM((bc, BLK, BLK), jnp.float32),  # Wd work block
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(K.astype(jnp.float32))
    return L, Wd


def _run_winv(L, Wd, bc_res, resident, interpret):
    """W = L⁻¹ via the tile-wise kernel (always L-resident: its cost is
    DMA + kp³/6 MXU tile matmuls, so extra grid steps are cheap — unlike
    the factor kernel's serial chain, residency here never trades
    against chain walks).  ``resident`` (the factor's choice) is unused.
    """
    Bp, n, _ = L.shape
    kp = n // BLK
    # tile-kernel scratch: resident L (n²) + W column (2·n·BLK with
    # the DMA copy in flight) + Wd tiles (kp·BLK²) + matmul temps —
    # measured 113.9 MB at bw=16/n=1024 with the bc_res estimate, so
    # size from the winv footprint with an 80 MB budget
    per_w = (n * n + 2 * n * BLK + kp * BLK * BLK + 8 * BLK * BLK) * 4
    bw_cap = max(1, int(80 * 1024 * 1024) // per_w)
    bw = _balanced_bc(Bp, bw_cap)
    Bw = -(-Bp // bw) * bw
    if Bw != Bp:
        # identity-pad so the W grid divides evenly (L of I is I)
        padL = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), (Bw - Bp, n, n))
        padD = jnp.broadcast_to(
            jnp.eye(BLK, dtype=L.dtype), (Bw - Bp, kp, BLK, BLK)
        )
        L2 = jnp.concatenate([L, padL], axis=0)
        Wd2 = jnp.concatenate([Wd, padD], axis=0)
    else:
        L2, Wd2 = L, Wd
    W = pl.pallas_call(
        partial(_winv_tile_kernel, n=n, bc=bw, kp=kp),
        grid=(Bw // bw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Bw, n, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bw, n, BLK), jnp.float32),        # W block column
            pltpu.VMEM((bw, n, n), jnp.float32),          # resident L
            pltpu.VMEM((bw, kp, BLK, BLK), jnp.float32),  # Wd diagonals
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(L2, Wd2)
    return W[:Bp]


@partial(jax.jit, static_argnames=("interpret", "micro", "resident"))
def chol_inv_slab(K: jnp.ndarray, interpret: bool = False, micro=None,
                  resident=None):
    """(L, W) with K = L Lᵀ and W = L⁻¹ for a (B, N, N) f32 batch.

    HBM-resident slab kernels: in-kernel batch vectorization at every
    supported N (vs ``chol_inv_batched``'s VMEM-resident bc=1 at 1024).
    Non-PSD inputs propagate NaNs exactly like ``jnp.linalg.cholesky``.
    ``micro``/``resident`` override the diag-loop variant and the
    VMEM-residency choice (None = env/auto default; probe knobs).
    """
    return _run_slab(K, interpret=interpret, micro=micro, resident=resident)
