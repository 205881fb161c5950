"""Toy continuous-control environments (pure-jnp, jittable).

The reference RL subprojects run on MuJoCo / Safety-Gym / D4RL — external
simulators unavailable offline.  These analogs keep the same contract
(obs/action Boxes, reward + safety cost channels) as fully-jittable pure
functions, so whole rollouts stay on device.

  * ``PointGoal`` — 2-D point mass steering to a goal with a circular
    hazard that emits safety cost (the Safety-Gym shape SIMMER uses),
  * ``Pendulum`` — classic swing-up (PMDB/RLLG-style dense control task).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["PointGoal", "Pendulum"]


class EnvSpec(NamedTuple):
    obs_dim: int
    act_dim: int
    act_limit: float


class PointGoal:
    """State: [x, y, vx, vy]; goal at (1, 1); hazard disk at (0.5, 0.5)."""

    spec = EnvSpec(obs_dim=6, act_dim=2, act_limit=1.0)
    hazard_center = jnp.asarray([0.5, 0.5])
    hazard_radius = 0.25
    goal = jnp.asarray([1.0, 1.0])
    dt = 0.1

    def reset(self, key) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pos = jax.random.uniform(key, (2,), minval=-0.2, maxval=0.2)
        state = jnp.concatenate([pos, jnp.zeros(2)])
        return state, self.obs(state)

    def obs(self, state):
        return jnp.concatenate([state, self.goal - state[:2]])

    def step(self, state, action, key=None):
        pos, vel = state[:2], state[2:]
        vel = 0.9 * vel + self.dt * jnp.clip(action, -1, 1)
        pos = pos + self.dt * vel
        state = jnp.concatenate([pos, vel])
        dist = jnp.linalg.norm(self.goal - pos)
        reward = -dist - 0.01 * jnp.sum(action**2)
        in_hazard = jnp.linalg.norm(pos - self.hazard_center) < self.hazard_radius
        cost = in_hazard.astype(jnp.float32)
        done = dist < 0.05
        return state, self.obs(state), reward, cost, done


class Pendulum:
    spec = EnvSpec(obs_dim=3, act_dim=1, act_limit=2.0)
    dt = 0.05
    g, m, l = 10.0, 1.0, 1.0

    def reset(self, key):
        th = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
        state = jnp.asarray([th, 0.0])
        return state, self.obs(state)

    def obs(self, state):
        th, thdot = state[0], state[1]
        return jnp.asarray([jnp.cos(th), jnp.sin(th), thdot / 8.0])

    def step(self, state, action, key=None):
        th, thdot = state[0], state[1]
        u = jnp.clip(action[0], -self.spec.act_limit, self.spec.act_limit)
        thdot = thdot + (
            3 * self.g / (2 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        ) * self.dt
        thdot = jnp.clip(thdot, -8.0, 8.0)
        th = th + thdot * self.dt
        state = jnp.asarray([th, thdot])
        th_norm = ((th + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        reward = -(th_norm**2 + 0.1 * thdot**2 + 0.001 * u**2)
        cost = (jnp.abs(thdot) > 7.0).astype(jnp.float32)
        return state, self.obs(state), reward, cost, jnp.asarray(False)
