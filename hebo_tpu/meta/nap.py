"""NAP: transformer neural-process surrogate for meta-BO.

Parity: NAP (/root/reference/NAP/):
  * PFN-style masked transformer over (X, y) context + query points
    (nap/policies/transformer.py:19-324 ``generate_D_q_matrix`` —
    context-token self-attention, query tokens attend to context only),
  * NAP policy head emitting per-query acquisition scores + value head
    (nap/policies/nap.py:42-255),
  * meta-training on distributions over functions; the reference trains
    with PPO over BO episodes (nap/RL/ppo_nap.py) — here the surrogate is
    first meta-trained supervised (PFN regression objective: Gaussian NLL
    of held-out y under random GP-sample tasks), the policy path is in
    hebo_tpu.meta.ppo.

TPU-native: one jitted meta-training scan; tasks are a vmapped batch
axis; attention uses fixed (context, query) paddings with masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.base import BaseModel, register_model

__all__ = ["TransformerNP", "meta_train_np", "NAPSurrogate", "sample_gp_tasks"]


class TransformerNP(nn.Module):
    """Masked transformer: context tokens embed (x, y); query tokens embed
    (x, 0) and may only attend to context tokens.

    Mixed spaces (``cat_dims`` non-empty) embed each categorical column
    with a learned per-column table before the token projection — the
    reference's ``MixedTypeTransformerModel``
    (NAP/nap/policies/transformer.py, mixed-type variant)."""

    dim_x: int
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 3
    cat_dims: Tuple[int, ...] = ()
    num_categories: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, Xc, yc, Xq, ctx_mask):
        """Xc (B, Nc, dx), yc (B, Nc, 1), Xq (B, Nq, dx),
        ctx_mask (B, Nc) → (mu, log_sigma) each (B, Nq, 1).
        Categorical columns of X hold integer codes (as floats)."""
        B, Nc, _ = Xc.shape
        Nq = Xq.shape[1]
        if self.cat_dims:
            embeds = [
                nn.Embed(c, min(8, 1 + c // 2), name=f"cat_emb{i}")
                for i, c in enumerate(self.num_categories)
            ]
            cat_set = set(self.cat_dims)
            num_idx = tuple(j for j in range(self.dim_x) if j not in cat_set)

            def feat(X):
                parts = [X[..., num_idx]] if num_idx else []
                for e, j in zip(embeds, self.cat_dims):
                    parts.append(e(X[..., j].astype(jnp.int32)))
                return jnp.concatenate(parts, axis=-1)

        else:
            feat = lambda X: X  # noqa: E731
        emb_c = nn.Dense(self.d_model)(
            jnp.concatenate([feat(Xc), yc], axis=-1)
        )
        emb_q = nn.Dense(self.d_model)(
            jnp.concatenate(
                [feat(Xq), jnp.zeros((B, Nq, 1), Xq.dtype)], axis=-1
            )
        )
        h = jnp.concatenate([emb_c, emb_q], axis=1)  # (B, Nc+Nq, d)

        # attention mask: everyone attends to (valid) context only; context
        # also attends to itself (PFN train/test mask, transformer.py:19)
        key_ok = jnp.concatenate(
            [ctx_mask, jnp.zeros((B, Nq), bool)], axis=1
        )  # only context tokens are attendable
        attn_mask = jnp.broadcast_to(
            key_ok[:, None, None, :], (B, self.n_heads, Nc + Nq, Nc + Nq)
        )
        for _ in range(self.n_layers):
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model
            )(h, h, mask=attn_mask)
            h = nn.LayerNorm()(h + a)
            f = nn.Dense(self.d_model)(nn.gelu(nn.Dense(2 * self.d_model)(h)))
            h = nn.LayerNorm()(h + f)
        hq = h[:, Nc:, :]
        mu = nn.Dense(1)(hq)
        log_sigma = jnp.clip(nn.Dense(1)(hq), -5.0, 3.0)
        return mu, log_sigma


def sample_gp_tasks(
    key, batch, n_points, dim_x, dtype=jnp.float32,
    cat_dims=(), num_categories=(),
):
    """Draw random smooth functions (RBF GP samples with random
    lengthscale/scale) on random X — the meta-training distribution.

    With ``cat_dims`` set, those columns carry integer codes and the
    sample kernel uses a Hamming (overlap) distance on them — mixed-type
    meta-tasks for the MixedTypeTransformerModel analogue."""
    kx, kl, kf, kn, kc = jax.random.split(key, 5)
    X = jax.random.uniform(kx, (batch, n_points, dim_x), dtype, -1.0, 1.0)
    if cat_dims:
        for j, c in zip(cat_dims, num_categories):
            kc, kj = jax.random.split(kc)
            codes = jax.random.randint(kj, (batch, n_points), 0, c)
            X = X.at[:, :, j].set(codes.astype(dtype))
    log_ls = jax.random.uniform(kl, (batch, 1, 1, 1), dtype, -1.5, 0.5)
    ls = jnp.exp(log_ls)
    diff = X[:, :, None, :] - X[:, None, :, :]
    if cat_dims:
        is_cat = jnp.zeros((dim_x,), bool).at[jnp.asarray(cat_dims)].set(True)
        d2 = jnp.sum(
            jnp.where(is_cat, (jnp.abs(diff) > 1e-6).astype(dtype), diff**2),
            axis=-1, keepdims=True,
        )
    else:
        d2 = jnp.sum(diff**2, axis=-1, keepdims=True)
    K = jnp.exp(-0.5 * d2[..., 0] / ls[..., 0] ** 2) + 1e-4 * jnp.eye(n_points)
    L = jnp.linalg.cholesky(K)
    f = jnp.einsum("bij,bj->bi", L, jax.random.normal(kf, (batch, n_points), dtype))
    y = f[..., None] + 0.05 * jax.random.normal(kn, (batch, n_points, 1), dtype)
    return X, y


def meta_train_np(
    model: TransformerNP,
    key: jax.Array,
    *,
    n_steps: int = 500,
    batch: int = 16,
    n_points: int = 32,
    min_ctx: int = 4,
    lr: float = 1e-3,
):
    """PFN objective: NLL of held-out points given a random-size context."""
    dim_x = model.dim_x
    cat_kw = dict(
        cat_dims=model.cat_dims, num_categories=model.num_categories
    )
    k0, key = jax.random.split(key)
    Xd, yd = sample_gp_tasks(k0, 1, n_points, dim_x, **cat_kw)
    params = model.init(
        k0, Xd[:, :min_ctx], yd[:, :min_ctx], Xd[:, min_ctx:],
        jnp.ones((1, min_ctx), bool),
    )
    opt = optax.adam(lr)

    @jax.jit
    def run(params, key):
        def loss_fn(p, k):
            k1, k2 = jax.random.split(k)
            X, y = sample_gp_tasks(k1, batch, n_points, dim_x, **cat_kw)
            nc = jax.random.randint(k2, (), min_ctx, n_points - 4)
            ctx_mask = (
                jnp.arange(n_points - 4)[None, :] < nc
            ) & jnp.ones((batch, 1), bool)
            Xc, yc = X[:, : n_points - 4], y[:, : n_points - 4]
            Xq, yq = X[:, n_points - 4 :], y[:, n_points - 4 :]
            mu, log_sigma = model.apply(p, Xc, yc * ctx_mask[..., None], Xq, ctx_mask)
            nll = 0.5 * (
                ((yq - mu) / jnp.exp(log_sigma)) ** 2
                + 2 * log_sigma
                + jnp.log(2 * jnp.pi)
            )
            return jnp.mean(nll)

        def step(carry, _):
            p, st, k = carry
            k, ks = jax.random.split(k)
            val, g = jax.value_and_grad(loss_fn)(p, ks)
            up, st = opt.update(g, st, p)
            p = jax.tree.map(lambda a, b: a + b, p, up)
            return (p, st, k), val

        (p, _, _), losses = jax.lax.scan(
            step, (params, opt.init(params), key), None, length=n_steps
        )
        return p, losses

    params, losses = run(params, key)
    return params, np.asarray(losses)


@register_model("nap")
class NAPSurrogate(BaseModel):
    """Meta-trained neural-process surrogate with the BaseModel contract.

    The transformer is meta-trained once (lazily, cached per input dim)
    on synthetic GP tasks; ``fit`` just stores the context set — inference
    is amortized (no per-task optimization), the NAP/PFN selling point."""

    _pretrained = {}

    support_grad = True

    def __init__(self, space, num_out=1, **conf):
        super().__init__(space, num_out, **conf)
        assert num_out == 1
        self.d_model = conf.get("d_model", 64)
        self.n_layers = conf.get("n_layers", 3)
        self.meta_steps = conf.get("meta_steps", 300)
        self._seed = conf.get("seed", 0)
        self.dim_x = space.num_cols
        cat_dims = tuple(int(c) for c in space.cat_dims)
        num_cats = tuple(
            int(space.num_categories[c]) for c in space.cat_dims
        )
        self.model = TransformerNP(
            dim_x=self.dim_x, d_model=self.d_model, n_layers=self.n_layers,
            cat_dims=cat_dims, num_categories=num_cats,
        )
        # numeric-column mask: cat codes bypass the [-1, 1] normalization
        self._num_mask = np.ones((self.dim_x,), bool)
        if cat_dims:
            self._num_mask[list(cat_dims)] = False
        ck = (
            self.dim_x, self.d_model, self.n_layers, self.meta_steps,
            cat_dims, num_cats,
        )
        if ck not in NAPSurrogate._pretrained:
            params, _ = meta_train_np(
                self.model, jax.random.PRNGKey(42), n_steps=self.meta_steps
            )
            NAPSurrogate._pretrained[ck] = params
        self.params = NAPSurrogate._pretrained[ck]
        self._ctx = None

    def fit(self, X, y):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32).reshape(len(X), 1)
        ok = np.isfinite(y[:, 0])
        X, y = X[ok], y[ok]
        Xn = self._normalize_np(X)
        mu_y, sd_y = float(y.mean()), max(float(y.std()), 1e-8)
        self._ctx = (Xn, (y - mu_y) / sd_y, mu_y, sd_y)
        return self

    def _normalize_np(self, X):
        lb, ub = self.space.opt_lb, self.space.opt_ub
        Xn = 2 * (np.asarray(X, np.float32) - lb) / np.maximum(ub - lb, 1e-9) - 1
        return np.where(self._num_mask, Xn, np.asarray(X, np.float32)).astype(
            np.float32
        )

    def predict(self, X):
        Xn_c, yn_c, mu_y, sd_y = self._ctx
        Xq = self._normalize_np(X)
        mu, log_sigma = self.model.apply(
            self.params,
            jnp.asarray(Xn_c)[None],
            jnp.asarray(yn_c)[None],
            jnp.asarray(Xq, jnp.float32)[None],
            jnp.ones((1, len(Xn_c)), bool),
        )
        mu = np.asarray(mu[0]) * sd_y + mu_y
        var = (np.asarray(np.exp(log_sigma[0])) * sd_y) ** 2
        return mu, var

    # pure-state protocol
    @property
    def state(self):
        Xn_c, yn_c, mu_y, sd_y = self._ctx
        return (
            self.params,
            jnp.asarray(Xn_c),
            jnp.asarray(yn_c),
            jnp.float32(mu_y),
            jnp.float32(sd_y),
        )

    def predict_pure(self, state, Xs):
        params, Xn_c, yn_c, mu_y, sd_y = state
        lb = jnp.asarray(self.space.opt_lb, jnp.float32)
        ub = jnp.asarray(self.space.opt_ub, jnp.float32)
        Xq = 2 * (Xs - lb) / jnp.maximum(ub - lb, 1e-9) - 1
        Xq = jnp.where(jnp.asarray(self._num_mask), Xq, Xs)
        mu, log_sigma = self.model.apply(
            params, Xn_c[None], yn_c[None], Xq[None],
            jnp.ones((1, Xn_c.shape[0]), bool),
        )
        mu = mu[0] * sd_y + mu_y
        var = (jnp.exp(log_sigma[0]) * sd_y) ** 2
        return mu, jnp.maximum(var, 1e-10)

    @property
    def noise(self):
        return np.zeros(1)
