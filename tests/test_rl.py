"""RL subprojects: SAC core, Sauté/Simmer, PMDB, RLLG."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.rl.envs import Pendulum, PointGoal
from hebo_tpu.rl.pmdb import DynamicsEnsemble, pessimistic_rollout
from hebo_tpu.rl.sac import SAC, ReplayBuffer
from hebo_tpu.rl.simmer import SauteWrapper, SimmerController


def _collect(env, agent, state, buf, rng, key, n_steps=200, aug=False):
    k = key
    k, kr = jax.random.split(k)
    s, obs = env.reset(kr)
    ep_cost = 0.0
    for t in range(n_steps):
        k, ka = jax.random.split(k)
        a = np.asarray(agent.act(state, jnp.asarray(obs)[None], ka))[0]
        s, nobs, r, c, d = env.step(s, jnp.asarray(a))
        buf.add(np.asarray(obs), a, float(r), np.asarray(nobs), float(d), float(c))
        ep_cost += float(c)
        obs = nobs
        if bool(d):
            k, kr = jax.random.split(k)
            s, obs = env.reset(kr)
    return ep_cost


def test_sac_improves_pendulum():
    env = Pendulum()
    agent = SAC(env.spec.obs_dim, env.spec.act_dim, env.spec.act_limit,
                hidden=32)
    key = jax.random.PRNGKey(0)
    state = agent.init(key)
    buf = ReplayBuffer(env.spec.obs_dim, env.spec.act_dim, 20_000)
    rng = np.random.default_rng(0)

    def eval_return(state, n=100):
        k = jax.random.PRNGKey(42)
        s, obs = env.reset(k)
        total = 0.0
        for _ in range(n):
            a = np.asarray(
                agent.act(state, jnp.asarray(obs)[None], k, deterministic=True)
            )[0]
            s, obs, r, c, d = env.step(s, jnp.asarray(a))
            total += float(r)
        return total

    r0 = eval_return(state)
    for it in range(6):
        _collect(env, agent, state, buf, rng, jax.random.PRNGKey(it), 150)
        for u in range(60):
            batch = buf.sample(rng, 128)
            state = agent.update(state, batch, jax.random.PRNGKey(1000 + it * 60 + u))
    r1 = eval_return(state)
    assert np.isfinite(r1)
    assert r1 > r0 - 50  # learning is at least not diverging; usually improves


def test_saute_budget_dynamics():
    env = SauteWrapper(PointGoal(), budget=2.0)
    key = jax.random.PRNGKey(0)
    aug_state, obs = env.reset(key)
    assert obs.shape == (env.spec.obs_dim,)
    # drive into the hazard: budget decreases, reward flips to penalty
    s = aug_state
    z_hist = []
    for _ in range(60):
        a = jnp.asarray([0.7, 0.7])  # towards hazard then goal
        s, obs, r, c, d = env.step(s, a)
        z_hist.append(float(s[1]))
    assert min(z_hist) < 1.0  # budget consumed at some point


def test_simmer_controller():
    ctl = SimmerController(target_cost=1.0, budget_min=0.5, budget_max=5.0)
    b0 = ctl.budget
    for _ in range(5):
        b = ctl.update(observed_episode_cost=3.0)  # overspending
    assert b < b0
    for _ in range(20):
        b = ctl.update(observed_episode_cost=0.0)  # very safe
    assert b > ctl.budget_min


def test_dynamics_ensemble_and_pessimism():
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((256, 3)).astype(np.float32)
    act = rng.standard_normal((256, 1)).astype(np.float32)
    next_obs = obs + 0.1 * act  # simple linear dynamics
    reward = -np.sum(obs**2, axis=1).astype(np.float32)
    ens = DynamicsEnsemble(3, 1, n_members=4, hidden=32, epochs=150)
    ens.fit(obs, act, next_obs, reward)
    nxt, rew = ens.predict_members(jnp.asarray(obs[:8]), jnp.asarray(act[:8]))
    assert nxt.shape == (4, 8, 3)
    err = float(jnp.mean((jnp.mean(nxt, 0) - jnp.asarray(next_obs[:8])) ** 2))
    assert err < 0.5

    def policy(o, k):
        return jnp.zeros((o.shape[0], 1))

    o_seq, a_seq, r_pess = pessimistic_rollout(
        ens, policy, jnp.asarray(obs[:8]), jax.random.PRNGKey(0),
        horizon=4, beta=5.0,
    )
    _, _, r_mean = pessimistic_rollout(
        ens, policy, jnp.asarray(obs[:8]), jax.random.PRNGKey(0),
        horizon=4, beta=0.0,
    )
    assert o_seq.shape == (4, 8, 3)
    # pessimistic belief yields lower (or equal) imagined returns
    assert float(r_pess.mean()) <= float(r_mean.mean()) + 0.1


def test_guided_sac_blends_guide():
    from hebo_tpu.rl.rllg import GuidedSAC

    env = Pendulum()

    def guide(obs):
        return jnp.full(obs.shape[:-1] + (1,), 0.5)

    def region(obs):
        return jnp.ones(obs.shape[:-1])

    agent = GuidedSAC(
        env.spec.obs_dim, env.spec.act_dim, guide, region,
        act_limit=env.spec.act_limit, lambda0=1.0, hidden=32,
    )
    state = agent.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((4, env.spec.obs_dim))
    a = agent.act(state, obs, jax.random.PRNGKey(1))
    # λ=1 in-region → behavior equals the guide exactly
    np.testing.assert_allclose(np.asarray(a), 0.5, atol=1e-5)
    # update runs and decays λ
    buf = ReplayBuffer(env.spec.obs_dim, env.spec.act_dim, 1000)
    rng = np.random.default_rng(0)
    for _ in range(50):
        buf.add(rng.standard_normal(3), rng.standard_normal(1), 0.0,
                rng.standard_normal(3), 0.0)
    state = agent.update(state, buf.sample(rng, 32), jax.random.PRNGKey(2))
    assert agent.lam < 1.0
