"""PMDB: offline model-based RL with pessimism-modulated dynamics belief.

Parity: PMDB (/root/reference/PMDB/, 1,948 LoC): learn an ensemble
dynamics model from an offline dataset; policy improvement uses imagined
rollouts whose next-state distribution is a *belief over ensemble
members reweighted toward pessimistic (low-value) predictions* — the
sampling temperature modulates pessimism instead of an explicit reward
penalty.

TPU-native: the ensemble trains as one vmapped program (member axis =
batch axis); belief-weighted rollouts are jitted scans.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.nn.deep_ensemble import MLPParams, _init_mlp

__all__ = ["DynamicsEnsemble", "pessimistic_rollout"]


def _dyn_forward(p: MLPParams, x):
    h = x
    for i, (w, b) in enumerate(zip(p.w, p.b)):
        h = h @ w + b
        if i < len(p.w) - 1:
            h = jax.nn.relu(h)
    return h  # [Δobs | reward]


class DynamicsEnsemble:
    """E-member MLP dynamics: (obs, act) → (Δobs, reward)."""

    def __init__(self, obs_dim, act_dim, n_members=5, hidden=64,
                 lr=1e-3, epochs=200):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.E = n_members
        self.sizes = [obs_dim + act_dim, hidden, hidden, obs_dim + 1]
        self.epochs = epochs
        self.opt = optax.adam(lr)
        self.params = None
        self._fit = jax.jit(self._fit_impl)

    def _fit_impl(self, key, X, Y):
        keys = jax.random.split(key, self.E)
        p0 = jax.vmap(lambda k: _init_mlp(k, self.sizes))(keys)

        def train_one(p, k):
            st = self.opt.init(p)
            n = X.shape[0]

            def step(carry, kk):
                p, s = carry
                idx = jax.random.randint(kk, (min(256, n),), 0, n)

                def loss(pp):
                    pred = _dyn_forward(pp, X[idx])
                    return jnp.mean((pred - Y[idx]) ** 2)

                g = jax.grad(loss)(p)
                up, s = self.opt.update(g, s, p)
                return (jax.tree.map(lambda a, b: a + b, p, up), s), None

            ks = jax.random.split(k, self.epochs)
            (pf, _), _ = jax.lax.scan(step, (p, st), ks)
            return pf

        return jax.vmap(train_one)(p0, keys)

    def fit(self, obs, act, next_obs, reward):
        X = jnp.asarray(np.concatenate([obs, act], axis=1), jnp.float32)
        Y = jnp.asarray(
            np.concatenate([next_obs - obs, reward.reshape(-1, 1)], axis=1),
            jnp.float32,
        )
        self.params = self._fit(jax.random.PRNGKey(0), X, Y)
        return self

    def predict_members(self, obs, act):
        """All members' (next_obs, reward): (E, B, obs_dim), (E, B)."""
        x = jnp.concatenate([obs, act], axis=-1)
        out = jax.vmap(lambda p: _dyn_forward(p, x))(self.params)
        return obs[None] + out[..., :-1], out[..., -1]


def pessimistic_rollout(
    ensemble: DynamicsEnsemble,
    policy_fn,
    obs0: jnp.ndarray,
    key: jax.Array,
    horizon: int = 5,
    beta: float = 2.0,
):
    """Imagined rollout sampling members with belief weights
    softmax(-β·reward_member): β > 0 biases toward pessimistic members
    (the pessimism-modulated belief); β = 0 is the uniform belief.

    Returns (obs_seq, act_seq, rew_seq) with leading time axis."""

    def step(carry, k):
        obs, kk = carry
        kk, ka, km = jax.random.split(kk, 3)
        act = policy_fn(obs, ka)
        nxt, rew = ensemble.predict_members(obs, act)  # (E, B, D), (E, B)
        w = jax.nn.softmax(-beta * rew, axis=0)  # pessimistic belief
        m = jax.vmap(
            lambda wi, kkk: jax.random.choice(kkk, ensemble.E, p=wi),
            in_axes=(1, 0),
        )(w, jax.random.split(km, obs.shape[0]))  # (B,) member per sample
        b_idx = jnp.arange(obs.shape[0])
        obs_next = nxt[m, b_idx]
        r = rew[m, b_idx]
        return (obs_next, kk), (obs, act, r)

    (_, _), (obs_seq, act_seq, rew_seq) = jax.lax.scan(
        step, (obs0, key), jnp.arange(horizon)
    )
    return obs_seq, act_seq, rew_seq
