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


def test_single_stream_matches_contract():
    """single_stream=True (r5 full-domain layout): same call signature,
    same output shapes, observed-only attention keys, and trainable
    end-to-end (pretrain + PPO smoke)."""
    import jax.numpy as jnp

    from hebo_tpu.meta.nap import sample_gp_tasks
    from hebo_tpu.meta.ppo import pretrain_policy

    policy = NAPPolicy(dim_x=2, d_model=32, n_layers=1, single_stream=True)
    key = jax.random.PRNGKey(0)
    X, y = sample_gp_tasks(key, 3, 12, 2)
    mask = jnp.zeros((3, 12), bool).at[:, :4].set(True)
    params = policy.init(key, X, y, X, mask, return_mu=True)
    logits, value = policy.apply(params, X, y, X, mask)
    assert logits.shape == (3, 12) and value.shape == (3,)
    lg, vl, mu = policy.apply(params, X, y, X, mask, return_mu=True)
    assert mu.shape == (3, 12)
    assert np.all(np.isfinite(np.asarray(logits)))
    # unobserved candidates' y must not leak: zeroing them is a no-op
    y_masked = jnp.where(mask[..., None], y, 0.0)
    logits2, _ = policy.apply(params, X, y_masked, X, mask)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits2), rtol=1e-6
    )
    # trains through both stages
    p2, losses = pretrain_policy(
        policy, key, n_iters=2, batch=4, n_cand=12, n_obs_range=(2, 6)
    )
    assert np.all(np.isfinite(losses))
    p3, regrets = ppo_train(
        policy, key, n_iters=2, batch=4, n_cand=12, horizon=4,
        init_params=p2,
    )
    assert np.all(np.isfinite(regrets))


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
