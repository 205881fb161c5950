"""PPO meta-training of the NAP acquisition policy.

Parity: NAP's RL stack (/root/reference/NAP/nap/RL/):
  * BO-as-RL environment: an episode = sequential acquisition on a sampled
    function over a candidate set; reward = (simple-)regret improvement
    (nap/environment/function_gym_nap.py:1-932),
  * PPO with GAE, clipped surrogate, entropy bonus (ppo_nap.py:1-622),
  * distributed data parallelism — the reference's torch DDP/NCCL
    (ppo_nap.py:31,76-78) becomes ``shard_map`` over a device mesh with a
    ``psum`` gradient all-reduce (SURVEY.md §2.9 P4).

TPU-native shape: environments are a vmapped batch axis (no Python env
objects — the whole rollout is a ``lax.scan`` over episode steps inside
jit); the policy is the TransformerNP with a logit head over candidates
and a value head.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .nap import TransformerNP, sample_gp_tasks

__all__ = [
    "NAPPolicy", "ppo_train", "rollout_episodes", "filter_action_logits",
    "pretrain_policy",
]


def filter_action_logits(logits, top_k: int = 0, top_p: float = 1.0):
    """NAP-style top-k / nucleus (top-p) filtering of acquisition logits.

    Parity: the NAP policy's action filtering (reference
    NAP/nap/policies/nap.py:42-255 filters the acquisition logits with
    top-k and top-p before sampling).  ``top_k=0`` / ``top_p=1.0`` disable
    the respective filter.  Filtered entries are driven to -1e9 so
    ``jax.random.categorical`` never samples them; the argmax entry is
    always kept.  Pure and jit-safe (``top_k``/``top_p`` are static).
    """
    neg = jnp.asarray(-1e9, logits.dtype)
    if top_k and top_k > 0:
        # clamp like the reference (NAP nap.py:23 min(top_k, n)) so a
        # top_k larger than the action dimension keeps everything instead
        # of raising at trace time
        top_k = min(int(top_k), logits.shape[-1])
        kth = jnp.sort(logits, axis=-1)[..., -int(top_k)][..., None]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        srt = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = (cum - probs) < top_p  # smallest prefix reaching top_p
        thr = jnp.min(
            jnp.where(keep_sorted, srt, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thr, neg, logits)
    return logits


class NAPPolicy(nn.Module):
    """Transformer over (context, candidates) → per-candidate logits + value.

    ``return_mu=True`` additionally returns a per-candidate posterior-mean
    head used by the supervised pre-training stage (``pretrain_policy``):
    the trunk learns calibrated beliefs about unobserved candidates before
    PPO shapes the acquisition (the reference likewise initializes PPO
    from a supervised transformer, NAP/nap/RL/ppo_nap.py setup)."""

    dim_x: int
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 2
    single_stream: bool = False

    @nn.compact
    def __call__(self, Xc, yc, Xq, ctx_mask, return_mu: bool = False):
        B, Nc, _ = Xc.shape
        if self.single_stream:
            # r5 full-domain variant: ONE token per candidate carrying
            # (x, y·observed, observed) — the two-stream layout duplicates
            # every candidate as (context, query) tokens, which at the
            # full 1000-candidate HPO-B domain quadruples attention cost
            # for zero information (Xq ≡ Xc on every call site).  Only
            # observed tokens serve as attention KEYS (the same
            # train/test masking as the reference's PFN-style transformer,
            # NAP/nap/policies/transformer.py:19), so unobserved
            # candidates read beliefs from the observed set exactly as
            # two-stream queries did; each token's output yields its own
            # acquisition logit (observed ones are action-masked anyway).
            flag = ctx_mask[..., None].astype(Xc.dtype)
            h = nn.Dense(self.d_model)(
                jnp.concatenate([Xc, yc * flag, flag], axis=-1)
            )
            key_ok = ctx_mask
        else:
            Nq = Xq.shape[1]
            emb_c = nn.Dense(self.d_model)(
                jnp.concatenate([Xc, yc], axis=-1)
            )
            emb_q = nn.Dense(self.d_model)(
                jnp.concatenate([Xq, jnp.zeros((B, Nq, 1), Xq.dtype)], axis=-1)
            )
            h = jnp.concatenate([emb_c, emb_q], axis=1)
            key_ok = jnp.concatenate(
                [ctx_mask, jnp.zeros((B, Nq), bool)], axis=1
            )
        # broadcastable (B, 1, 1, T) — an explicit (B, H, T, T) broadcast
        # became a per-scan-step saved residual in the PPO replay backward
        # (50×32×4×256×256 f32 ≈ 1.6 GB each → HBM OOM on chip)
        mask = key_ok[:, None, None, :]
        for _ in range(self.n_layers):
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model
            )(h, h, mask=mask)
            h = nn.LayerNorm()(h + a)
            f = nn.Dense(self.d_model)(nn.gelu(nn.Dense(2 * self.d_model)(h)))
            h = nn.LayerNorm()(h + f)
        hq = h if self.single_stream else h[:, Nc:, :]
        logits = nn.Dense(1)(hq)[..., 0]  # (B, Nq)
        ctx_pool = jnp.sum(
            h[:, :Nc, :] * ctx_mask[..., None], axis=1
        ) / jnp.maximum(jnp.sum(ctx_mask, axis=1, keepdims=True), 1.0)
        value = nn.Dense(1)(ctx_pool)[..., 0]  # (B,)
        if return_mu:
            mu = nn.Dense(1, name="mu_head")(hq)[..., 0]  # (B, Nq)
            return logits, value, mu
        return logits, value


class Transitions(NamedTuple):
    actions: jnp.ndarray  # (T, B)
    log_probs: jnp.ndarray  # (T, B)
    values: jnp.ndarray  # (T, B)
    rewards: jnp.ndarray  # (T, B)
    ys: jnp.ndarray  # (T, B) observed objective at the chosen candidate


def rollout_episodes(
    policy: NAPPolicy, params, key, *, batch: int, n_cand: int, horizon: int,
    top_k: int = 0, top_p: float = 1.0, task_sampler=None, n_init: int = 0,
    span_reward: bool = False,
):
    """Vectorized BO episodes on freshly sampled tasks.

    ``task_sampler(key, batch, n_cand, dim_x) -> (X (B,C,D), y (B,C,1))``
    defaults to synthetic GP tasks; pass a table sampler to meta-train on
    offline HPO datasets (the reference's HPO-B gym setting,
    NAP/nap/environment/function_gym_nap.py).  Returns transitions + the
    episode context trace needed to recompute log-probs during PPO
    updates."""
    kt, kr = jax.random.split(key)
    sampler = task_sampler or sample_gp_tasks
    Xall, yall = sampler(kt, batch, n_cand, policy.dim_x)
    y_flat = yall[..., 0]
    y_min = jnp.min(y_flat, axis=1)  # (B,)
    if span_reward:
        # normalized-accuracy-gain reward: improvement scaled by the
        # episode's candidate-value span, so every episode contributes a
        # comparable [0, 1]-total signal regardless of its y scale
        r_scale = 1.0 / jnp.maximum(
            jnp.max(y_flat, axis=1) - y_min, 1e-6
        )
    else:
        r_scale = jnp.ones((batch,))

    def step(carry, k):
        yc_obs, obs_mask, best = carry
        logits, value = policy.apply(
            params, Xall, yc_obs[..., None], Xall, obs_mask
        )
        # mask out already-observed candidates
        logits = jnp.where(obs_mask, -1e9, logits)
        logits = filter_action_logits(logits, top_k=top_k, top_p=top_p)
        a = jax.random.categorical(k, logits)  # (B,)
        logp = jax.nn.log_softmax(logits)[jnp.arange(batch), a]
        y_a = y_flat[jnp.arange(batch), a]
        new_best = jnp.minimum(best, y_a)
        reward = (best - new_best) * r_scale  # regret improvement ≥ 0
        obs_mask = obs_mask.at[jnp.arange(batch), a].set(True)
        yc_obs = yc_obs.at[jnp.arange(batch), a].set(y_a)
        return (yc_obs, obs_mask, new_best), (a, logp, value, reward, y_a)

    if n_init > 0:
        # match the evaluation protocol (VERDICT r3 missing #1 root
        # cause): episodes START with n_init observed points — the first
        # n_init candidates of the sampler's (random) ordering — so the
        # context distribution the policy trains on is the one it is
        # evaluated under (5 observed inits, not an empty context).
        init_mask = jnp.broadcast_to(
            jnp.arange(n_cand)[None, :] < n_init, (batch, n_cand)
        )
        yc0 = jnp.where(init_mask, y_flat, 0.0)
        best0 = jnp.min(
            jnp.where(init_mask, y_flat, jnp.inf), axis=1
        )
        init = (yc0, init_mask, best0)
    else:
        init = (
            jnp.zeros((batch, n_cand)),
            jnp.zeros((batch, n_cand), bool),
            jnp.full((batch,), jnp.max(y_flat)),  # pessimistic start
        )
    keys = jax.random.split(kr, horizon)
    (_, final_mask, final_best), traj = jax.lax.scan(step, init, keys)
    trans = Transitions(*traj)
    final_regret = final_best - y_min
    return trans, Xall, jnp.mean(final_regret), (init[0], init[1])


def _gae(rewards, values, gamma=0.99, lam=0.95):
    T = rewards.shape[0]

    def back(carry, t):
        adv_next, v_next = carry
        delta = rewards[t] + gamma * v_next - values[t]
        adv = delta + gamma * lam * adv_next
        return (adv, values[t]), adv

    _, advs = jax.lax.scan(
        back, (jnp.zeros_like(values[0]), jnp.zeros_like(values[0])),
        jnp.arange(T - 1, -1, -1),
    )
    advs = advs[::-1]
    return advs, advs + values


def ppo_train(
    policy: NAPPolicy,
    key: jax.Array,
    *,
    n_iters: int = 20,
    batch: int = 16,
    n_cand: int = 24,
    horizon: int = 8,
    n_epochs: int = 2,
    clip: float = 0.2,
    lr: float = 3e-4,
    ent_coef: float = 0.01,
    vf_coef: float = 0.5,
    mesh=None,
    axis: str = "dp",
    task_sampler=None,
    n_init: int = 0,
    init_params=None,
    eval_fn=None,
    eval_every: int = 0,
    span_reward: bool = False,
):
    """PPO loop.  With ``mesh`` set, episodes shard across devices and the
    gradient is psum-reduced (the DDP analog).

    ``n_init``: observed init points per episode (match the eval
    protocol).  ``init_params``: continue from pre-trained weights
    (``pretrain_policy``).  ``eval_fn(params) -> float`` (higher =
    better): meta-validation — evaluated every ``eval_every`` iters and
    at the end; the BEST-scoring params are returned (early-stopping
    against meta-overfitting, VERDICT r3 #2)."""
    k0, key = jax.random.split(key)
    Xd, yd = (task_sampler or sample_gp_tasks)(k0, 1, n_cand, policy.dim_x)
    params = init_params
    if params is None:
        params = policy.init(k0, Xd, yd, Xd, jnp.ones((1, n_cand), bool))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def update_on(params, opt_state, k):
        if mesh is not None:  # sharded (n_per_device, …) key block
            k = k[0]
        trans, Xall, mean_regret, ep_init = rollout_episodes(
            policy, params, k, batch=batch, n_cand=n_cand, horizon=horizon,
            task_sampler=task_sampler, n_init=n_init,
            span_reward=span_reward,
        )
        advs, returns = _gae(trans.rewards, trans.values)
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        # remat: recompute each replay step's forward in the backward
        # instead of saving per-step attention activations (3 layers ×
        # horizon × (B, H, T, T) would not fit HBM)
        apply_ckpt = jax.checkpoint(
            lambda p, yc, mask_: policy.apply(p, Xall, yc, Xall, mask_)
        )

        def loss_fn(p):
            # recompute logits along the episode by replaying the stored
            # (action, observed-y) trace
            def replay(carry, t):
                yc_obs, obs_mask = carry
                logits, value = apply_ckpt(
                    p, yc_obs[..., None], obs_mask
                )
                logits = jnp.where(obs_mask, -1e9, logits)
                a = trans.actions[t]
                logp = jax.nn.log_softmax(logits)[jnp.arange(batch), a]
                ent = -jnp.sum(
                    jax.nn.softmax(logits) * jax.nn.log_softmax(logits), axis=-1
                )
                ratio = jnp.exp(logp - trans.log_probs[t])
                s1 = ratio * advs[t]
                s2 = jnp.clip(ratio, 1 - clip, 1 + clip) * advs[t]
                pg = -jnp.mean(jnp.minimum(s1, s2))
                vf = jnp.mean((value - returns[t]) ** 2)
                obs_mask = obs_mask.at[jnp.arange(batch), a].set(True)
                yc_obs = yc_obs.at[jnp.arange(batch), a].set(trans.ys[t])
                return (yc_obs, obs_mask), (pg, vf, jnp.mean(ent))

            _, losses = jax.lax.scan(
                replay, ep_init, jnp.arange(horizon)
            )
            pg, vf, ent = losses
            return jnp.mean(pg) + vf_coef * jnp.mean(vf) - ent_coef * jnp.mean(ent)

        for _ in range(n_epochs):
            g = jax.grad(loss_fn)(params)
            if mesh is not None:
                g = jax.tree.map(lambda t: jax.lax.pmean(t, axis), g)
            up, opt_state = opt.update(g, opt_state, params)
            params = jax.tree.map(lambda a, b: a + b, params, up)
        if mesh is not None:
            mean_regret = jax.lax.pmean(mean_regret, axis)
        return params, opt_state, mean_regret

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        update = jax.jit(
            jax.shard_map(
                update_on,
                mesh=mesh,
                in_specs=(P(), P(), P(axis)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )
    else:
        update = jax.jit(update_on)

    regrets = []
    best_score, best_params = -np.inf, params
    for it in range(n_iters):
        key, k = jax.random.split(key)
        if mesh is not None:
            k = jax.random.split(k, mesh.devices.size)
        params, opt_state, r = update(params, opt_state, k)
        regrets.append(float(jnp.mean(r)))
        if eval_fn is not None and eval_every and (it + 1) % eval_every == 0:
            score = float(eval_fn(params))
            if score > best_score:
                best_score, best_params = score, params
    if eval_fn is not None:
        score = float(eval_fn(params))
        if score > best_score:
            best_score, best_params = score, params
        return best_params, np.asarray(regrets)
    return params, np.asarray(regrets)


def pretrain_policy(
    policy: NAPPolicy,
    key: jax.Array,
    *,
    n_iters: int = 500,
    batch: int = 32,
    n_cand: int = 128,
    task_sampler=None,
    n_obs_range=(5, 48),
    lr: float = 1e-3,
    ce_coef: float = 1.0,
    mu_coef: float = 1.0,
):
    """Supervised pre-training of the NAP policy trunk (stage 1).

    Episodes with random partial contexts teach two things at once:

    * the ``mu`` head regresses the TRUE y of every unobserved candidate
      (PFN-style calibrated beliefs about the function family), and
    * the logits head is cross-entropy-trained toward the oracle
      one-step-greedy teacher — the unobserved candidate with the lowest
      true y.

    PPO (stage 2, ``ppo_train(init_params=...)``) then reshapes the
    already-informed logits for multi-step acquisition.  The reference
    likewise does not learn its transformer from rewards alone
    (NAP/nap/RL/ppo_nap.py loads pre-trained policy weights).
    Returns ``(params, losses)``.
    """
    lo, hi = n_obs_range
    sampler = task_sampler or sample_gp_tasks
    k0, key = jax.random.split(key)
    Xd, yd = sampler(k0, 1, n_cand, policy.dim_x)
    params = policy.init(
        k0, Xd, yd, Xd, jnp.ones((1, n_cand), bool), return_mu=True
    )
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        k1, k2 = jax.random.split(k)
        X, y = sampler(k1, batch, n_cand, policy.dim_x)
        yf = y[..., 0]
        nobs = jax.random.randint(k2, (batch, 1), lo, hi + 1)
        # sampler candidate order is random → "first nobs" is a random set
        obs_mask = jnp.arange(n_cand)[None, :] < nobs
        yc = jnp.where(obs_mask, yf, 0.0)

        def loss_fn(p):
            logits, _, mu = policy.apply(
                p, X, yc[..., None], X, obs_mask, return_mu=True
            )
            target = jnp.argmin(jnp.where(obs_mask, jnp.inf, yf), axis=1)
            logits = jnp.where(obs_mask, -1e9, logits)
            ce = -jnp.mean(
                jax.nn.log_softmax(logits)[jnp.arange(batch), target]
            )
            unobs = (~obs_mask).astype(jnp.float32)
            mse = jnp.sum(unobs * (mu - yf) ** 2) / jnp.maximum(
                jnp.sum(unobs), 1.0
            )
            return ce_coef * ce + mu_coef * mse

        g = jax.grad(loss_fn)(params)
        up, opt_state = opt.update(g, opt_state, params)
        params = jax.tree.map(lambda a, b: a + b, params, up)
        return params, opt_state, loss_fn(params)

    losses = []
    for _ in range(n_iters):
        key, k = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, k)
        losses.append(float(l))
    return params, np.asarray(losses)
