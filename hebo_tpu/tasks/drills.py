"""DRiLLS-style RL baseline for logic synthesis (BOiLS comparison agent).

Parity: BOiLS ships DRiLLS (reference BOiLS/, the RL baseline its paper
compares against): an actor-critic agent that builds a synthesis-operator
sequence step by step, observing design statistics after each applied
operator and receiving QoR improvements as reward.  Here:

  * environment = incremental synthesis over ``BoilsTask``'s session —
    the state after step t is the metrics of the prefix sequence
    (size/size0, depth/depth0, step fraction, last QoR delta, one-hot of
    the previous operator);
  * agent = a small flax policy+value MLP; advantage actor-critic
    (discounted returns, entropy bonus), one jitted update per episode;
  * the black-box synthesis calls stay host-side (subprocess), matching
    the reference's process boundary.

Usage: ``DrillsBaseline(task).train(n_episodes)`` → best sequence /
QoR trace, directly comparable to ``BO_ALGOS['BOiLS']`` on the same
evaluation budget (each episode costs ``seq_len`` synthesis runs).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .boils import BoilsTask

__all__ = ["DrillsBaseline"]


class _PolicyValue(nn.Module):
    n_actions: int
    hidden: int = 32

    @nn.compact
    def __call__(self, s):
        h = nn.tanh(nn.Dense(self.hidden)(s))
        h = nn.tanh(nn.Dense(self.hidden)(h))
        return nn.Dense(self.n_actions)(h), nn.Dense(1)(h)[..., 0]


class DrillsBaseline:
    def __init__(
        self,
        task: Optional[BoilsTask] = None,
        hidden: int = 32,
        lr: float = 3e-3,
        gamma: float = 0.95,
        ent_coef: float = 0.01,
        vf_coef: float = 0.5,
        seed: int = 0,
    ):
        self.task = task or BoilsTask()
        self.ops = self.task.operators
        self.T = self.task.seq_len
        self.n_actions = len(self.ops)
        self.feat_dim = 4 + self.n_actions
        self.gamma = gamma
        self.net = _PolicyValue(self.n_actions, hidden)
        self._key = jax.random.PRNGKey(seed)
        self._key, k0 = jax.random.split(self._key)
        self.params = self.net.init(k0, jnp.zeros((1, self.feat_dim)))
        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self.ent_coef = ent_coef
        self.vf_coef = vf_coef
        self.best_qor = np.inf
        self.best_seq: list = []
        self.qor_trace: list = []

        @jax.jit
        def _act(params, s, key):
            logits, v = self.net.apply(params, s[None])
            a = jax.random.categorical(key, logits[0])
            return a, logits[0], v[0]

        @jax.jit
        def _update(params, opt_state, S, A, R):
            def loss_fn(p):
                logits, v = self.net.apply(p, S)  # (T, n_act), (T,)
                logp = jax.nn.log_softmax(logits)[jnp.arange(len(A)), A]
                adv = R - jax.lax.stop_gradient(v)
                pg = -jnp.mean(logp * adv)
                vf = jnp.mean((v - R) ** 2)
                ent = -jnp.mean(
                    jnp.sum(
                        jax.nn.softmax(logits) * jax.nn.log_softmax(logits),
                        axis=-1,
                    )
                )
                return pg + self.vf_coef * vf - self.ent_coef * ent

            val, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state = self.opt.update(g, opt_state, params)
            return optax.apply_updates(params, up), opt_state, val

        self._act = _act
        self._update = _update

    # ------------------------------------------------------------------ env
    def _features(self, size_r, depth_r, t, delta, last_a):
        one_hot = np.zeros(self.n_actions, np.float32)
        if last_a >= 0:
            one_hot[last_a] = 1.0
        return np.concatenate(
            [np.asarray([size_r, depth_r, t / self.T, delta], np.float32), one_hot]
        )

    def run_episode(self):
        """One incremental synthesis episode; returns (seq, qor, S, A, R)."""
        prefix, states, actions, rewards = [], [], [], []
        qor = 2.0  # empty-sequence QoR is size0/size0 + depth0/depth0 = 2
        size_r = depth_r = 1.0
        delta, last_a = 0.0, -1
        for t in range(self.T):
            s = self._features(size_r, depth_r, t, delta, last_a)
            self._key, ka = jax.random.split(self._key)
            a, _, _ = self._act(self.params, jnp.asarray(s), ka)
            a = int(a)
            prefix.append(self.ops[a])
            res = self.task.session.run_sequences([list(prefix)])[0]
            s0, d0 = self.task._base
            if res is not None:
                size_r = res[0] / max(s0, 1)
                depth_r = res[1] / max(d0, 1)
                new_qor = size_r + depth_r
            else:
                # failed synthesis: worst-case normalized QoR; reset the
                # ratio features too so the next state is consistent with
                # the reported QoR (ADVICE r2)
                size_r = depth_r = 1.0
                new_qor = 2.0
            delta = qor - new_qor
            states.append(s)
            actions.append(a)
            rewards.append(delta)
            qor = new_qor
            last_a = a
        return prefix, qor, np.stack(states), np.asarray(actions), np.asarray(rewards)

    # ------------------------------------------------------------------ train
    def train(self, n_episodes: int = 20) -> dict:
        for _ in range(n_episodes):
            seq, qor, S, A, rew = self.run_episode()
            # discounted returns
            R = np.zeros(self.T, np.float32)
            acc = 0.0
            for t in range(self.T - 1, -1, -1):
                acc = rew[t] + self.gamma * acc
                R[t] = acc
            self.params, self.opt_state, _ = self._update(
                self.params,
                self.opt_state,
                jnp.asarray(S),
                jnp.asarray(A),
                jnp.asarray(R),
            )
            self.qor_trace.append(float(qor))
            if qor < self.best_qor:
                self.best_qor, self.best_seq = float(qor), list(seq)
        return {
            "best_qor": self.best_qor,
            "best_seq": self.best_seq,
            "qor_trace": list(self.qor_trace),
        }
