"""Compact SAC in flax — the shared engine for SIMMER / PMDB / RLLG.

Soft actor-critic with twin Q networks, target smoothing, and automatic
entropy tuning.  Updates are one jitted program; rollout collection uses
the pure-jnp envs so full (collect → update) cycles stay on device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["SAC", "SACState", "ReplayBuffer"]


class _MLP(nn.Module):
    out: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out)(x)


class Actor(nn.Module):
    act_dim: int
    act_limit: float
    hidden: int = 64

    @nn.compact
    def __call__(self, obs):
        h = _MLP(2 * self.act_dim, self.hidden)(obs)
        mu, log_std = jnp.split(h, 2, axis=-1)
        log_std = jnp.clip(log_std, -6.0, 2.0)
        return mu, log_std

    def sample(self, params, obs, key):
        mu, log_std = self.apply(params, obs)
        eps = jax.random.normal(key, mu.shape)
        pre = mu + jnp.exp(log_std) * eps
        a = jnp.tanh(pre) * self.act_limit
        logp = jnp.sum(
            -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
            - jnp.log(self.act_limit * (1 - jnp.tanh(pre) ** 2) + 1e-6),
            axis=-1,
        )
        return a, logp


class Critic(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return _MLP(1, self.hidden)(x)[..., 0]


class SACState(NamedTuple):
    actor: dict
    q1: dict
    q2: dict
    q1_targ: dict
    q2_targ: dict
    log_alpha: jnp.ndarray
    opt_actor: optax.OptState
    opt_q: optax.OptState
    opt_alpha: optax.OptState


class ReplayBuffer:
    def __init__(self, obs_dim, act_dim, size=100_000):
        self.obs = np.zeros((size, obs_dim), np.float32)
        self.act = np.zeros((size, act_dim), np.float32)
        self.rew = np.zeros(size, np.float32)
        self.nobs = np.zeros((size, obs_dim), np.float32)
        self.done = np.zeros(size, np.float32)
        self.cost = np.zeros(size, np.float32)
        self.ptr = 0
        self.n = 0
        self.size = size

    def add(self, o, a, r, no, d, c=0.0):
        i = self.ptr
        self.obs[i], self.act[i], self.rew[i] = o, a, r
        self.nobs[i], self.done[i], self.cost[i] = no, d, c
        self.ptr = (i + 1) % self.size
        self.n = min(self.n + 1, self.size)

    def sample(self, rng, batch):
        idx = rng.integers(0, self.n, batch)
        return (
            self.obs[idx], self.act[idx], self.rew[idx],
            self.nobs[idx], self.done[idx], self.cost[idx],
        )


class SAC:
    def __init__(self, obs_dim, act_dim, act_limit=1.0, hidden=64,
                 gamma=0.99, tau=0.005, lr=3e-4, target_entropy=None):
        self.actor = Actor(act_dim, act_limit, hidden)
        self.q1 = Critic(hidden)
        self.q2 = Critic(hidden)
        self.gamma, self.tau = gamma, tau
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.target_entropy = (
            target_entropy if target_entropy is not None else -float(act_dim)
        )
        self.opt = optax.adam(lr)
        self._update = jax.jit(self._update_impl)

    def init(self, key) -> SACState:
        ka, k1, k2 = jax.random.split(key, 3)
        o = jnp.zeros((1, self.obs_dim))
        a = jnp.zeros((1, self.act_dim))
        pa = self.actor.init(ka, o)
        p1 = self.q1.init(k1, o, a)
        p2 = self.q2.init(k2, o, a)
        return SACState(
            actor=pa, q1=p1, q2=p2, q1_targ=p1, q2_targ=p2,
            log_alpha=jnp.asarray(0.0),
            opt_actor=self.opt.init(pa),
            opt_q=self.opt.init((p1, p2)),
            opt_alpha=self.opt.init(jnp.asarray(0.0)),
        )

    def act(self, state: SACState, obs, key, deterministic=False):
        if deterministic:
            mu, _ = self.actor.apply(state.actor, obs)
            return jnp.tanh(mu) * self.actor.act_limit
        a, _ = self.actor.sample(state.actor, obs, key)
        return a

    def _update_impl(self, state: SACState, batch, key):
        obs, act, rew, nobs, done = batch
        k1, k2 = jax.random.split(key)
        alpha = jnp.exp(state.log_alpha)

        # targets
        na, nlogp = self.actor.sample(state.actor, nobs, k1)
        q_targ = jnp.minimum(
            self.q1.apply(state.q1_targ, nobs, na),
            self.q2.apply(state.q2_targ, nobs, na),
        )
        backup = rew + self.gamma * (1.0 - done) * (q_targ - alpha * nlogp)

        def q_loss(qp):
            p1, p2 = qp
            l1 = jnp.mean((self.q1.apply(p1, obs, act) - backup) ** 2)
            l2 = jnp.mean((self.q2.apply(p2, obs, act) - backup) ** 2)
            return l1 + l2

        gq = jax.grad(q_loss)((state.q1, state.q2))
        upq, opt_q = self.opt.update(gq, state.opt_q, (state.q1, state.q2))
        q1, q2 = jax.tree.map(lambda a_, b: a_ + b, (state.q1, state.q2), upq)

        def a_loss(pa):
            a, logp = self.actor.sample(pa, obs, k2)
            q = jnp.minimum(
                self.q1.apply(q1, obs, a), self.q2.apply(q2, obs, a)
            )
            return jnp.mean(alpha * logp - q), jnp.mean(logp)

        (la, mean_logp), ga = jax.value_and_grad(a_loss, has_aux=True)(state.actor)
        upa, opt_actor = self.opt.update(ga, state.opt_actor, state.actor)
        actor = jax.tree.map(lambda a_, b: a_ + b, state.actor, upa)

        def alpha_loss(log_alpha):
            return -jnp.exp(log_alpha) * (mean_logp + self.target_entropy)

        gal = jax.grad(alpha_loss)(state.log_alpha)
        upal, opt_alpha = self.opt.update(gal, state.opt_alpha, state.log_alpha)
        log_alpha = state.log_alpha + upal

        q1_targ = jax.tree.map(
            lambda t, s: (1 - self.tau) * t + self.tau * s, state.q1_targ, q1
        )
        q2_targ = jax.tree.map(
            lambda t, s: (1 - self.tau) * t + self.tau * s, state.q2_targ, q2
        )
        return SACState(actor, q1, q2, q1_targ, q2_targ, log_alpha,
                        opt_actor, opt_q, opt_alpha)

    def update(self, state, batch_np, key):
        batch = tuple(jnp.asarray(b) for b in batch_np[:5])
        return self._update(state, batch, key)
