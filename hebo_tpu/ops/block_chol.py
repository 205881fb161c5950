"""Block-sharded Cholesky across a device mesh (SURVEY §5.7 long axis).

When N outgrows one chip's dense Cholesky the framework offers two
routes: the pivoted-Cholesky-preconditioned CG posterior (ops/cg.py) and
this **distributed right-looking blocked Cholesky**: the kernel matrix is
sharded by row slabs over a 1-D mesh axis, and each panel step is

  1. ``all_gather`` of the current block column (the only communication,
     N·B floats per step),
  2. a redundant B×B diagonal-block factorization on every device
     (cheaper than broadcasting a factor),
  3. a local triangular panel solve + local rank-B trailing update.

The reference caps instead of scaling (MCBO exact_gp.py:120-294:
``max_cholesky_size``, dataset subsampling at 1000 points) — there is no
distributed factorization anywhere in the monorepo; this is the
TPU-native long-axis answer (row slabs ride the mesh, updates are local
matmuls on the MXU, the gathered panel rides ICI).

Trailing updates use masked full-width rank-B products so every step has
static shapes (≈3× the N³/3 minimal FLOPs; the masked form trades FLOPs
— abundant on the MXU — for a shape-stable, retrace-free program).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["block_cholesky_sharded", "block_chol_solve_sharded"]


def _slab_kernel(A_loc, jitter, *, axis: str, block: int, n_blocks: int):
    """shard_map body: A_loc is this device's (rows_local, N) slab;
    ``jitter`` is a replicated scalar (traced, so a jitter-ladder caller
    can escalate without recompiling)."""
    n_dev = lax.axis_size(axis)
    i_dev = lax.axis_index(axis)
    rows_local = A_loc.shape[0]
    N = A_loc.shape[1]
    row0 = i_dev * rows_local
    local_rows = row0 + jnp.arange(rows_local)  # global row ids of the slab
    A_loc = A_loc + jitter.astype(A_loc.dtype) * (
        (local_rows[:, None] == jnp.arange(N)[None, :]).astype(A_loc.dtype)
    )
    L_loc0 = jnp.zeros_like(A_loc)

    def step(j, carry):
        A_l, L_l = carry
        c0 = j * block
        # (1) gather the current block column across slabs → (N, B)
        col_loc = lax.dynamic_slice_in_dim(A_l, c0, block, axis=1)
        col = lax.all_gather(col_loc, axis, tiled=True)  # (N, B)
        # (2) redundant diagonal-block factorization (B³/3, every device)
        Ajj = lax.dynamic_slice_in_dim(col, c0, block, axis=0)
        Ljj = jnp.linalg.cholesky(Ajj)
        # (3) panel: rows of col below the diagonal block, solved against Ljj
        Pfull = lax.linalg.triangular_solve(
            Ljj, col, left_side=False, lower=True, transpose_a=True
        )  # col @ Ljj^{-T}, (N, B)
        gr = jnp.arange(N)
        below = gr >= c0 + block  # rows strictly below the diagonal block
        # panel column of L: Ljj on the diagonal block, solved rows below
        Lcol = jnp.where(below[:, None], Pfull, 0.0)
        Lcol = Lcol + lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(Pfull), Ljj, c0, axis=0
        )
        # local copy of the panel rows this device owns
        Lcol_loc = lax.dynamic_slice_in_dim(Lcol, row0, rows_local, axis=0)
        L_l = lax.dynamic_update_slice_in_dim(L_l, Lcol_loc, c0, axis=1)
        # (4) masked trailing update: A -= P_below · P_belowᵀ
        Pmask = jnp.where(below[:, None], Pfull, 0.0)
        Pmask_loc = lax.dynamic_slice_in_dim(Pmask, row0, rows_local, axis=0)
        A_l = A_l - Pmask_loc @ Pmask.T
        return A_l, L_l

    _, L_loc = lax.fori_loop(0, n_blocks, step, (A_loc, L_loc0))
    # keep only the lower triangle (masked updates leave junk above it)
    L_loc = jnp.where(
        local_rows[:, None] >= jnp.arange(N)[None, :], L_loc, 0.0
    )
    return L_loc


def block_cholesky_sharded(
    K: jnp.ndarray,
    mesh: Mesh,
    *,
    block: int = 128,
    axis: Optional[str] = None,
    jitter: float = 1e-6,
) -> jnp.ndarray:
    """Lower-triangular L with L Lᵀ = K + jitter·I, rows sharded over
    ``mesh``.  N must be divisible by both the mesh size and ``block``
    (pad with identity rows/cols otherwise — see ``utils.dtypes``
    bucketing)."""
    axis = axis or mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    N = K.shape[0]
    assert N % n_dev == 0, (N, n_dev)
    if block > N // n_dev:
        # a block wider than one device's slab cannot be panel-solved
        # locally; shrink — and say so, because the FLOP/communication
        # balance changes (ADVICE r2: no silent reduction)
        import warnings

        warnings.warn(
            f"block_cholesky_sharded: block={block} > slab rows "
            f"{N // n_dev}; using effective block={N // n_dev}",
            stacklevel=2,
        )
        block = N // n_dev
    assert N % block == 0, (N, block)
    fn = jax.shard_map(
        partial(
            _slab_kernel,
            axis=axis,
            block=block,
            n_blocks=N // block,
        ),
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None),
    )
    jit_arr = jnp.asarray(jitter, K.dtype)
    if isinstance(K, jax.core.Tracer) or isinstance(jitter, jax.core.Tracer):
        # under jit (e.g. the GP posterior cache): shard_map's in_specs
        # introduce the resharding; device_put is neither needed nor legal
        return fn(K, jit_arr)
    return fn(jax.device_put(K, NamedSharding(mesh, P(axis, None))), jit_arr)


def block_chol_solve_sharded(
    K: jnp.ndarray,
    B: jnp.ndarray,
    mesh: Mesh,
    *,
    block: int = 128,
    axis: Optional[str] = None,
    jitter: float = 1e-6,
) -> jnp.ndarray:
    """Solve (K + jitter·I) X = B via the sharded factor.

    The triangular solves run replicated on the gathered factor (L is
    N×N; for the N where this path activates — up to a few tens of
    thousands — a replicated triangular solve is cheap next to the
    factorization's N³)."""
    L = block_cholesky_sharded(K, mesh, block=block, axis=axis, jitter=jitter)
    L = jax.device_put(L, NamedSharding(mesh, P()))  # replicate
    Z = lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True, transpose_a=False
    )
    return lax.linalg.triangular_solve(
        L, Z, left_side=True, lower=True, transpose_a=True
    )
