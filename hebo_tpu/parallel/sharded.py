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

__all__ = ["make_mesh", "make_sharded_suggest_step"]


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
                worst = jnp.argsort(-F[:, 0])[: elites.shape[0]]
                X = X.at[worst].set(elites)

        # local shards are concatenated along the pop axis by out_specs
        return X, F, best_params

    smapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P()),
    )
    return jax.jit(smapped)
