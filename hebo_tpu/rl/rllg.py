"""RLLG: reinforcement learning with local guide policies.

Parity: RLLG (/root/reference/RLLG/, 6,320 LoC — SAC variants with local
guides): an expert "guide" policy is trusted inside designated regions of
the state space; the behavior policy blends agent and guide actions with
a state-dependent confidence λ(s), and an auxiliary imitation loss pulls
the learned policy toward the guide where the guide is active.  λ decays
over training so the agent gradually takes over.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .sac import SAC, SACState

__all__ = ["GuidedSAC"]


class GuidedSAC(SAC):
    def __init__(
        self,
        obs_dim,
        act_dim,
        guide_fn: Callable[[jnp.ndarray], jnp.ndarray],
        region_fn: Callable[[jnp.ndarray], jnp.ndarray],
        act_limit=1.0,
        lambda0: float = 1.0,
        lambda_decay: float = 0.995,
        bc_coef: float = 0.5,
        **kw,
    ):
        super().__init__(obs_dim, act_dim, act_limit, **kw)
        self.guide_fn = guide_fn
        self.region_fn = region_fn  # obs → in-guide-region indicator [0,1]
        self.lam = lambda0
        self.lambda_decay = lambda_decay
        self.bc_coef = bc_coef
        self._guided_update = jax.jit(self._guided_update_impl)

    # behavior policy: blend agent and guide inside the guide region
    def act(self, state: SACState, obs, key, deterministic=False):
        a = super().act(state, obs, key, deterministic)
        g = self.guide_fn(obs)
        w = self.lam * self.region_fn(obs)
        if a.ndim > g.ndim:
            g = jnp.broadcast_to(g, a.shape)
        w = jnp.reshape(w, (-1, 1)) if a.ndim == 2 else w
        return (1.0 - w) * a + w * g

    def decay(self):
        self.lam *= self.lambda_decay

    def _guided_update_impl(self, state: SACState, batch, key):
        state = self._update_impl(state, batch, key)
        obs = batch[0]
        # auxiliary BC loss toward the guide inside its region
        g = self.guide_fn(obs)
        w = self.region_fn(obs).reshape(-1, 1)

        def bc_loss(pa):
            mu, _ = self.actor.apply(pa, obs)
            a = jnp.tanh(mu) * self.actor.act_limit
            return jnp.mean(w * (a - g) ** 2)

        gbc = jax.grad(bc_loss)(state.actor)
        upd, opt_actor = self.opt.update(
            jax.tree.map(lambda t: self.bc_coef * t, gbc),
            state.opt_actor, state.actor,
        )
        actor = jax.tree.map(lambda a_, b: a_ + b, state.actor, upd)
        return state._replace(actor=actor, opt_actor=opt_actor)

    def update(self, state, batch_np, key):
        batch = tuple(jnp.asarray(b) for b in batch_np[:5])
        out = self._guided_update(state, batch, key)
        self.decay()
        return out
