"""NAP PPO meta-training tests: single-device + data-parallel mesh."""

import jax
import numpy as np
import pytest

from hebo_tpu.meta.ppo import NAPPolicy, ppo_train, rollout_episodes


def test_rollout_shapes():
    policy = NAPPolicy(dim_x=2, d_model=32, n_layers=1)
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    from hebo_tpu.meta.nap import sample_gp_tasks

    Xd, yd = sample_gp_tasks(key, 1, 12, 2)
    params = policy.init(key, Xd, yd, Xd, jnp.ones((1, 12), bool))
    trans, Xall, regret, _init = rollout_episodes(
        policy, params, key, batch=4, n_cand=12, horizon=5
    )
    assert trans.actions.shape == (5, 4)
    assert trans.rewards.shape == (5, 4)
    assert float(regret) >= 0.0
    # actions never repeat within an episode (masking works)
    a = np.asarray(trans.actions)
    for b in range(4):
        assert len(set(a[:, b])) == 5


def test_ppo_train_runs_and_updates():
    policy = NAPPolicy(dim_x=2, d_model=32, n_layers=1)
    params, regrets = ppo_train(
        policy, jax.random.PRNGKey(0),
        n_iters=4, batch=8, n_cand=16, horizon=5,
    )
    assert len(regrets) == 4
    assert np.all(np.isfinite(regrets))


def test_ppo_data_parallel_mesh():
    from hebo_tpu.parallel.sharded import make_mesh

    n_dev = min(4, len(jax.devices()))
    mesh = make_mesh(n_dev, axis="dp")
    policy = NAPPolicy(dim_x=2, d_model=32, n_layers=1)
    params, regrets = ppo_train(
        policy, jax.random.PRNGKey(1),
        n_iters=2, batch=4, n_cand=12, horizon=4,
        mesh=mesh, axis="dp",
    )
    assert len(regrets) == 2
    assert np.all(np.isfinite(regrets))
