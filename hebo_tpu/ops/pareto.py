"""Multi-objective building blocks as fixed-shape XLA ops.

The reference delegates nondominated sorting / crowding distance to pymoo
(HEBO/hebo/acq_optimizers/evolution_optimizer.py:133-139, Dominator usage
in optimizers/general.py:160-172).  Here they are pure jnp functions over
a ``(P, M)`` objective tensor — population is the leading (vectorized)
axis, everything is O(P²) dense masked ops which XLA maps onto the
VPU/MXU; no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "domination_matrix",
    "nondominated_rank",
    "crowding_distance",
    "nsga2_key",
    "pareto_mask",
    "hypervolume_mc",
]

_INF = jnp.inf


def domination_matrix(F: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """``D[i, j] = True`` iff point i dominates point j (minimization).

    ``valid``: optional (P,) bool mask; invalid rows dominate nothing and
    are dominated by everything (they sink to the worst front).
    """
    le = jnp.all(F[:, None, :] <= F[None, :, :], axis=-1)
    lt = jnp.any(F[:, None, :] < F[None, :, :], axis=-1)
    D = le & lt
    if valid is not None:
        D = D & valid[:, None]  # invalid i dominates nothing
        D = D | ((~valid)[None, :] & valid[:, None])  # valid dominates invalid
        D = D & ~((~valid)[:, None] & (~valid)[None, :])
    return D


def nondominated_rank(F: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Front index per point (0 = Pareto front), via iterative peeling.

    Fixed shape: a fori_loop of at most P iterations over the (P, P)
    domination matrix; P is the (static) population size.
    """
    P = F.shape[0]
    D = domination_matrix(F, valid)
    n_dom = jnp.sum(D, axis=0)  # how many dominate j

    def cond(state):
        i, rank, n_dom, assigned = state
        # stop when every point has a front — typically after #fronts ≪ P
        # iterations (the fixed-P loop would serialize P tiny steps)
        return (~jnp.all(assigned)) & (i < P)

    def body(state):
        i, rank, n_dom, assigned = state
        front = (n_dom == 0) & (~assigned)
        rank = jnp.where(front, i, rank)
        assigned = assigned | front
        # remove the front's domination contributions
        removed = jnp.sum(D & front[:, None], axis=0)
        n_dom = jnp.where(assigned, n_dom, n_dom - removed)
        return i + 1, rank, n_dom, assigned

    # derive inits from F so shard_map varying-axis metadata propagates
    # (a bare jnp.full constant would be unvarying and break scan carries)
    zero = (F[:, 0] * 0).astype(jnp.int32)
    rank0 = zero + P
    _, rank, _, _ = lax.while_loop(
        cond, body, (zero[0] * 0, rank0, n_dom, zero.astype(bool))
    )
    return rank


def crowding_distance(F: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """NSGA-II crowding distance computed *within* each front.

    pymoo-fidelity semantics (reference delegates to pymoo's
    ``calc_crowding_distance``, used by
    HEBO/hebo/acq_optimizers/evolution_optimizer.py:133-139): per objective,
    sort each front, give the front's boundary points +inf, and normalize
    interior gaps by the *front's own* objective span.  Fronts are
    contiguous segments after a (rank, f) lexsort, so the per-front
    min/max come from ``segment_min``/``segment_max`` keyed on the rank —
    fixed shapes, no data-dependent control flow.
    """
    P, M = F.shape
    big = jnp.asarray(1e30, F.dtype)
    n_seg = P + 1  # nondominated_rank assigns ranks in [0, P]

    # per-front, per-objective span (the pymoo normalization constant)
    f_max = jax.vmap(
        lambda f: jax.ops.segment_max(f, rank, num_segments=n_seg),
        in_axes=1, out_axes=1,
    )(F)  # (n_seg, M)
    f_min = jax.vmap(
        lambda f: jax.ops.segment_min(f, rank, num_segments=n_seg),
        in_axes=1, out_axes=1,
    )(F)
    span_front = jnp.maximum(f_max - f_min, 1e-12)  # (n_seg, M)

    def one_obj(f, span_f):
        # stable sort by (rank, f): fronts become contiguous runs
        order = jnp.lexsort((f, rank))
        f_s = f[order]
        r_s = rank[order]
        prev_same = jnp.concatenate([jnp.array([False]), r_s[1:] == r_s[:-1]])
        next_same = jnp.concatenate([r_s[:-1] == r_s[1:], jnp.array([False])])
        f_prev = jnp.concatenate([f_s[:1], f_s[:-1]])
        f_next = jnp.concatenate([f_s[1:], f_s[-1:]])
        d = jnp.where(
            prev_same & next_same,
            (f_next - f_prev) / span_f[r_s],
            big,  # front boundary → +inf (applied after the sum below)
        )
        out = jnp.zeros_like(d).at[order].set(d)
        return out

    dists = jax.vmap(one_obj, in_axes=(1, 1), out_axes=1)(F, span_front)
    d = jnp.sum(jnp.minimum(dists, big), axis=1) / M  # pymoo divides by n_obj
    return jnp.where(jnp.any(dists >= big, axis=1), _INF, d)


def nsga2_key(rank: jnp.ndarray, crowd: jnp.ndarray) -> jnp.ndarray:
    """Composite scalar sort key: ascending rank, descending crowding.

    Exact (no saturation): the crowding value is replaced by its ordinal
    position in a descending sort of the whole population, so argsorting
    the key reproduces lexsort((−crowd, rank)) — distinct crowding values
    never tie, matching pymoo's rank-then-crowding survival exactly.
    """
    P = rank.shape[0]
    c = jnp.where(jnp.isnan(crowd), -jnp.inf, crowd)
    crowd_ord = jnp.argsort(jnp.argsort(-c))  # 0 = most crowded-distance
    return (rank.astype(jnp.float32) * P + crowd_ord.astype(jnp.float32))


def pareto_mask(F: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Boolean mask of nondominated (Pareto-optimal) points.

    Parity: reference ``get_pf`` (HEBO/hebo/optimizers/general.py:160-172).
    """
    D = domination_matrix(F, valid)
    mask = ~jnp.any(D, axis=0)
    if valid is not None:
        mask = mask & valid
    return mask


def hypervolume_mc(
    F: jnp.ndarray,
    ref_point: jnp.ndarray,
    key: jax.Array,
    n_samples: int = 8192,
) -> jnp.ndarray:
    """Monte-Carlo hypervolume of the dominated region below ``ref_point``.

    Used by EHVI-style batch selection (reference general.py:110-139 uses
    pymoo's exact HV; MC keeps shapes static for any M on device).
    """
    M = F.shape[-1]
    lo = jnp.min(F, axis=0)
    u = jax.random.uniform(key, (n_samples, M), dtype=F.dtype)
    pts = lo + u * (ref_point - lo)
    dominated = jnp.any(jnp.all(F[None, :, :] <= pts[:, None, :], axis=-1), axis=1)
    vol_box = jnp.prod(ref_point - lo)
    return jnp.mean(dominated.astype(F.dtype)) * vol_box
