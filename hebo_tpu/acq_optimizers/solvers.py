"""febo-style solvers: candidate/grid + multi-start box L-BFGS (vmapped).

Parity: RDUCB's vendored febo solver family (RDUCB/hdbo/febo/solvers/):
``CandidateSolver``/``FiniteDomainSolver``/``GridSolver`` (candidate.py:8-60)
minimize over a fixed candidate set with one batched call, and
``fmin_multipoint_l_bfgs_b`` (multi_lbfgs.py:592) runs many L-BFGS-B
instances whose function/gradient evaluations are batched into single
calls.

TPU-native: the multipoint idea IS ``vmap`` — a compact two-loop-recursion
L-BFGS with projected box constraints runs all starts in lockstep, so each
iteration is one batched (f, ∇f) evaluation on device; no scipy Fortran.
"""

from __future__ import annotations

import weakref
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["candidate_solver", "grid_solver", "multi_start_lbfgs"]

# adapter memoization for the legacy f(X)->y call form: keyed weakly on the
# underlying function (and, for bound methods, the instance) so repeated
# calls reuse ONE jit trace without writing attributes onto caller-owned
# callables (ADVICE r2).  Values hold no strong refs back to the key.
_WRAP_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _memo_wrap(f: Callable) -> Callable:
    """``f(X)->y``  →  ``wrapped(args, X)->y``, memoized.

    Bound methods are a fresh object per attribute access, so the cache is
    anchored on ``f.__self__`` (weakly) with the underlying ``__func__`` as
    sub-key; plain functions anchor on themselves.  Non-weakrefable
    callables fall back to an unmemoized wrapper (they retrace — same as
    before, minus the attribute mutation)."""
    base = getattr(f, "__func__", f)
    self_obj = getattr(f, "__self__", None)
    anchor = self_obj if self_obj is not None else base
    try:
        per = _WRAP_CACHE.get(anchor)
    except TypeError:
        per = None
        anchor = None
    if anchor is None:

        def wrapped(a, X, _f=f):
            return _f(X)

        return wrapped
    if self_obj is not None:
        # anchor is the instance (weak); the value is a per-instance dict
        # keyed on __func__ — the CLASS owns __func__, so those strong
        # key/closure refs never pin the instance.
        if per is None:
            per = {}
            _WRAP_CACHE[anchor] = per
        wrapped = per.get(base)
        if wrapped is None:
            sref = weakref.ref(self_obj)

            def wrapped(a, X, _base=base, _sref=sref):
                return _base(_sref(), X)

            per[base] = wrapped
        return wrapped
    # plain function: anchor IS base.  Any strong ref from the cached
    # VALUE back to base (a closure cell, or a dict keyed on base) would
    # make the WeakKeyDictionary entry immortal, leaking every jit
    # executable keyed on the wrapper.  Store the wrapper directly and
    # hold base only weakly.
    wrapped = per
    if wrapped is None:
        fref = weakref.ref(base)

        def wrapped(a, X, _fref=fref):
            return _fref()(X)

        _WRAP_CACHE[base] = wrapped
    return wrapped


def candidate_solver(f: Callable, candidates: np.ndarray) -> Tuple[np.ndarray, float]:
    """Minimize over a finite candidate set (febo CandidateSolver)."""
    vals = np.asarray(f(np.asarray(candidates))).ravel()
    i = int(np.argmin(vals))
    return np.asarray(candidates)[i], float(vals[i])


def grid_solver(
    f: Callable, lb, ub, points_per_dim: int = 25
) -> Tuple[np.ndarray, float]:
    """Cartesian-grid candidate solver (febo GridSolver, candidate.py:42).

    Grid size is ``points_per_dim ** d`` — use for low-d subdomains only
    (exactly the reference's use inside line/TR subdomain BO)."""
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    axes = [np.linspace(l, u, points_per_dim) for l, u in zip(lb, ub)]
    mesh = np.meshgrid(*axes, indexing="ij")
    cands = np.stack([m.ravel() for m in mesh], axis=1)
    return candidate_solver(f, cands)


@partial(jax.jit, static_argnames=("f", "n_iters", "history"))
def _lbfgs_batch(f, args, X0, lb, ub, n_iters: int, history: int):
    """Vmapped projected L-BFGS: X0 (B, D) starts advance in lockstep.

    ``f(args, X (B, D)) -> (B, 1)``; ``args`` is a traced pytree (model
    state, acquisition params, …) so refits reuse the compiled program
    instead of baking fresh constants into a new executable per call."""
    B, D = X0.shape
    g_fn = jax.vmap(jax.grad(lambda x: f(args, x[None, :])[0, 0]))

    def project(X):
        return jnp.clip(X, lb[None, :], ub[None, :])

    def step(carry, it):
        X, S, Y, rho, k = carry  # S,Y: (B, m, D) curvature pairs; k: count
        G = g_fn(X)

        # two-loop recursion, batched over B
        def two_loop(g, s, y, r):
            m = history

            def bwd(i, state):
                q, alphas = state
                idx = (k - 1 - i) % m
                a = r[idx] * jnp.dot(s[idx], q)
                valid = i < jnp.minimum(k, m)
                a = jnp.where(valid, a, 0.0)
                q = q - a * y[idx] * jnp.where(valid, 1.0, 0.0)
                return q, alphas.at[i].set(a)

            q, alphas = lax.fori_loop(0, m, bwd, (g, jnp.zeros(m)))
            # initial Hessian scaling γ = sᵀy / yᵀy of the newest pair
            newest = (k - 1) % m
            sy = jnp.dot(s[newest], y[newest])
            yy = jnp.dot(y[newest], y[newest])
            gamma = jnp.where((k > 0) & (yy > 1e-12), sy / yy, 1.0)
            z = gamma * q

            def fwd(i, z):
                j = m - 1 - i
                idx = (k - 1 - j) % m
                valid = j < jnp.minimum(k, m)
                b = r[idx] * jnp.dot(y[idx], z)
                return z + jnp.where(valid, (alphas[j] - b), 0.0) * s[idx]

            z = lax.fori_loop(0, m, fwd, z)
            return z

        Z = jax.vmap(two_loop)(G, S, Y, rho)

        # backtracking line search on the projected path (batched)
        f_cur = f(args, X)[:, 0]

        def try_step(t):
            Xn = project(X - t * Z)
            return Xn, f(args, Xn)[:, 0]

        ts = jnp.asarray([1.0, 0.3, 0.1, 0.03, 0.01], jnp.float32)
        Xs_all, fs_all = jax.vmap(try_step)(ts)  # (T, B, D), (T, B)
        best_t = jnp.argmin(fs_all, axis=0)  # (B,)
        Xn = Xs_all[best_t, jnp.arange(B)]
        fn = fs_all[best_t, jnp.arange(B)]
        improved = fn < f_cur
        Xn = jnp.where(improved[:, None], Xn, X)

        # curvature pair update
        s_new = Xn - X
        Gn = g_fn(Xn)
        y_new = Gn - G
        idx = k % history
        sy = jnp.sum(s_new * y_new, axis=1)
        good = sy > 1e-10
        S = S.at[:, idx].set(jnp.where(good[:, None], s_new, S[:, idx]))
        Y = Y.at[:, idx].set(jnp.where(good[:, None], y_new, Y[:, idx]))
        rho = rho.at[:, idx].set(
            jnp.where(good, 1.0 / jnp.maximum(sy, 1e-12), rho[:, idx])
        )
        return (Xn, S, Y, rho, k + 1), fn

    S0 = jnp.zeros((B, history, D), jnp.float32)
    Y0 = jnp.zeros((B, history, D), jnp.float32)
    rho0 = jnp.zeros((B, history), jnp.float32)
    (Xf, _, _, _, _), fs = lax.scan(
        step, (project(X0), S0, Y0, rho0, jnp.asarray(0)), jnp.arange(n_iters)
    )
    return Xf, f(args, Xf)[:, 0]


def multi_start_lbfgs(
    f: Callable,
    X0: np.ndarray,
    lb,
    ub,
    n_iters: int = 30,
    history: int = 8,
    args=None,
) -> Tuple[np.ndarray, float]:
    """Minimize from many starts with one batched program.

    Two call forms (contract of febo ``fmin_multipoint_l_bfgs_b``):

    * ``f(X (B, D)) -> (B, 1)`` — simple jax-differentiable callable;
    * ``f(args, X) -> (B, 1)`` with ``args`` a traced pytree — pass the
      model state/acq params here so repeated calls (one per BO
      iteration) hit the SAME compiled executable instead of retracing
      with fresh baked-in constants (jit keys on ``f``'s identity, so
      ``f`` must be stable across calls — memoize closures per model,
      as EvolutionOpt does).
    """
    if args is None:
        f, args = _memo_wrap(f), ()
    X0 = jnp.asarray(X0, jnp.float32)
    lb = jnp.asarray(lb, jnp.float32)
    ub = jnp.asarray(ub, jnp.float32)
    Xf, fv = _lbfgs_batch(f, args, X0, lb, ub, int(n_iters), int(history))
    i = int(jnp.argmin(fv))
    return np.asarray(Xf[i]), float(fv[i])
