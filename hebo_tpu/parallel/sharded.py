"""Multi-chip SPMD suggest step: sharded GP fitting + island NSGA-II.

The reference has no multi-device BO path at all (SURVEY.md §2.9: its
parallelism is a Python process pool for deep ensembles and NCCL DDP only
in NAP's RL trainer).  The TPU-native scale axes are:

  * hyperparameter **chains/restarts** — each device fits its own pSGLD /
    Adam chain(s) on the (replicated) dataset; the best chain is selected
    with ``pmin`` + a weighted ``psum`` broadcast, and the hyperparameter
    *ensemble* stays sharded for prediction,
  * **evolutionary islands** — the NSGA-II population is sharded across
    devices, each island evolves locally, elites migrate via
    ``all_gather`` every few generations, and the final population is
    gathered for batch selection.

Everything here is ``shard_map`` over a 1-D ``Mesh(('pop',))`` so it runs
identically on a real TPU slice (ICI collectives) and on the CPU test
backend with ``--xla_force_host_platform_device_count``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..acq_optimizers.evolution import EvolveSpaceMeta, evolve_raw

__all__ = [
    "make_mesh",
    "make_sharded_suggest_step",
    "make_fused_suggest_sharded",
]


def make_mesh(n_devices: Optional[int] = None, axis: str = "pop") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _tree_select_best(tree, loss, axis):
    """Broadcast the pytree of the argmin-loss device to all devices."""
    best = lax.pmin(loss, axis)
    w = (loss == best).astype(jnp.float32)
    w = w / lax.psum(w, axis)  # tie-safe weights
    return jax.tree.map(lambda t: lax.psum(t * w, axis), tree)


def make_sharded_suggest_step(
    mesh: Mesh,
    core,
    acq,
    meta: EvolveSpaceMeta,
    *,
    pop_per_device: int = 16,
    n_gens: int = 16,
    migrate_every: int = 4,
    axis: str = "pop",
):
    """Build a jitted SPMD program: fit-chains → select best → islands.

    Returns ``step(keys, data, acq_params, init_pop)`` where
      keys: (n_dev,) PRNG keys (sharded),
      data: GPData (replicated),
      init_pop: (n_dev * pop_per_device, D) (sharded along pop axis).
    Output: gathered population (n_dev*pop_per_device, D), objectives, and
    the selected best hyperparameters.
    """
    n_dev = mesh.devices.size

    def model_predict(args, X):
        (params, cache, data), acq_params = args

        class _Shim:
            # evolve's eval_fn expects a model-like predict; the core is
            # closed over statically.
            @staticmethod
            def predict_pure(state, Xs):
                p, c, d = state
                mu, var = core.predict_scaled(p, c, d, Xs)
                return mu * d.y_std + d.y_mean, var * d.y_std**2

        return acq.eval_pure(_Shim, (params, cache, data), acq_params, X)

    def per_device(key, data, acq_params, init_pop_local):
        # --- chain-parallel GP fit: one chain per device ----------------
        k_fit, k_evo = jax.random.split(key[0])
        p0 = core.init_params(k_fit, data)
        # components of p0 not touched by the per-device key are unvarying
        # along the mesh axis; mark the whole tree device-varying so the
        # scan carry type is consistent.
        def _pvary(t):
            try:
                return lax.pcast(t, (axis,), to="varying")
            except ValueError:  # already varying
                return t

        p0 = jax.tree.map(_pvary, p0)
        pf, loss, _samples = core.fit_from(k_fit, p0, data)
        best_params = _tree_select_best(pf, loss, axis)
        cache = core.posterior_cache(best_params, data)
        eval_args = ((best_params, cache, data), acq_params)

        # --- island evolution with periodic elite migration -------------
        X = init_pop_local

        n_rounds = max(1, n_gens // migrate_every)
        for r in range(n_rounds):
            k_evo, k_r = jax.random.split(k_evo)
            X, F = evolve_raw(
                k_r, X, eval_args, eval_fn=model_predict, meta=meta,
                n_gens=migrate_every,
            )
            if r < n_rounds - 1:
                # migrate: broadcast each island's best point, replace worst
                elite_id = jnp.argmin(F[:, 0])
                elites = lax.all_gather(X[elite_id], axis)  # (n_dev, D)
                k_mig = min(int(elites.shape[0]), int(X.shape[0]))
                worst = jnp.argsort(-F[:, 0])[:k_mig]
                X = X.at[worst].set(elites[:k_mig])

        # local shards are concatenated along the pop axis by out_specs
        return X, F, best_params

    smapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P()),
    )
    return jax.jit(smapped)


def _pvary_tree(tree, axis):
    """Mark every leaf device-varying along ``axis`` (idempotent)."""

    def _pv(t):
        try:
            return lax.pcast(t, (axis,), to="varying")
        except (ValueError, TypeError):
            return t

    return jax.tree.map(_pv, tree)


def make_fused_suggest_sharded(
    mesh: Mesh,
    core,
    acq,
    meta: EvolveSpaceMeta,
    *,
    n_restarts: int,
    iters: int,
    pop: int,
    n_obj: int,
    migrate_every: int = 10,
    axis: Optional[str] = None,
):
    """SPMD version of HEBO's fused suggest program (optimizers/hebo.py
    ``_fused_suggest``): same (big, scal, init_pop) packing, same packed
    outputs, two scale axes:

    * **restarts**: ``n_dev x n_restarts`` pSGLD restart chains run as one
      vmapped axis whose sharding is constrained to the mesh — the XLA
      SPMD partitioner splits the chains across devices and inserts the
      argmin/gather collectives (scaling-book style: annotate shardings,
      let XLA place collectives);
    * **population**: the NSGA-II population is sharded into per-device
      islands under ``shard_map``; elites migrate via ``all_gather`` every
      ``migrate_every`` generations.

    The reference has no multi-device suggest at all (SURVEY.md §2.9);
    this is the TPU-native scale-out of its two hot loops
    (HEBO/hebo/optimizers/hebo.py:119-193).
    """
    from ..acquisitions.acq import AcqParams
    from ..models.gp.gp import GPData

    axis = axis or mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert pop % n_dev == 0, (pop, n_dev)
    nd = len(core.numeric_dims)
    D = len(meta.lb)
    R_total = n_restarts * n_dev
    chain_sh = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    class _Shim:
        @staticmethod
        def predict_pure(state, Xs):
            samples, caches, d = state
            mu, var = core.predict_ensemble(samples, caches, d, Xs)
            return mu * d.y_std + d.y_mean, var * d.y_std**2

    def eval_fn(args, Xc):
        state, pr = args
        return acq.eval_pure(_Shim, state, pr, Xc)

    def island(k_evo, state, pr, init_pop_local):
        """Per-device island evolution with elite all_gather migration."""
        i_dev = lax.axis_index(axis)
        k = jax.random.fold_in(k_evo, i_dev)
        X = init_pop_local
        n_rounds = max(1, iters // migrate_every)
        F = None
        for r in range(n_rounds):
            k, k_r = jax.random.split(k)
            X, F = evolve_raw(
                k_r, X, (state, pr), eval_fn=eval_fn, meta=meta,
                n_gens=migrate_every,
            )
            if r < n_rounds - 1:
                elite_id = jnp.argmin(F[:, 0])
                elites = lax.all_gather(X[elite_id], axis)  # (n_dev, D)
                k_mig = min(int(elites.shape[0]), int(X.shape[0]))
                worst = jnp.argsort(-F[:, 0])[:k_mig]
                X = X.at[worst].set(elites[:k_mig])
        mu_pop, var_pop = _Shim.predict_pure(state, X)
        return jnp.concatenate([X, F, mu_pop, var_pop], axis=1)

    island_sm = jax.shard_map(
        island,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=P(axis),
    )

    @partial(jax.jit, out_shardings=(repl, repl, repl, repl, repl))
    def fused(big, scal, init_pop):
        Xp = big[:, :D]
        yp = big[:, D : D + 1]
        maskp = big[:, D + 1] > 0.5
        data = GPData(
            X=Xp, y=yp, mask=maskp,
            x_lb=scal[:nd], x_span=scal[nd : 2 * nd],
            y_mean=scal[2 * nd], y_std=scal[2 * nd + 1],
        )
        kappa_ = scal[2 * nd + 2]
        eps_ = scal[2 * nd + 3]
        key = jax.random.PRNGKey(scal[2 * nd + 4].astype(jnp.int32))
        k_fit, k_evo, k_jit = jax.random.split(key, 3)

        # --- restart chains: vmapped axis sharded across the mesh -------
        keys = jax.random.split(k_fit, R_total)
        keys = lax.with_sharding_constraint(keys, chain_sh)

        def one(k):
            k1, k2 = jax.random.split(k)
            p0 = core.init_params(k1, data)
            return core.fit_from(k2, p0, data)

        pf, loss, samples = jax.vmap(one)(keys)
        best = jnp.argmin(loss)
        pf_g = jax.tree.map(lambda t: t[best], pf)
        samples_g = jax.tree.map(lambda t: t[best], samples)
        caches = jax.vmap(lambda p: core.posterior_cache(p, data))(samples_g)
        state = (samples_g, caches, data)

        y_masked = jnp.where(data.mask, data.y[:, 0], jnp.inf)
        b = jnp.argmin(y_masked)
        mu_b, _ = core.predict_ensemble(samples_g, caches, data, data.X[b][None, :])
        tau = mu_b[0, 0] * data.y_std + data.y_mean
        noise_scale = jnp.sqrt(jnp.exp(pf_g.log_noise) + core.noise_lb) * data.y_std
        pr = AcqParams(tau=tau, kappa=kappa_, eps=eps_, key=k_jit, noise=noise_scale)

        # --- island evolution (incumbent injected into slot 0) ----------
        init = init_pop.at[0].set(data.X[b])
        packed = island_sm(k_evo, state, pr, init)
        return packed, data, pf_g, samples_g, caches

    return fused
