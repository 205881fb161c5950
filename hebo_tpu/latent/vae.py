"""Metric-learned VAE for latent-space BO (T-LBO).

Parity: T-LBO (/root/reference/T-LBO/):
  * ``BaseVAE`` lightning module → here a flax.linen VAE with Gaussian
    encoder/decoder for continuous vectors and a categorical
    (softmax-decoder) variant for sequence spaces
    (weighted_retraining/weighted_retraining/models.py:18-486),
  * soft **contrastive / triplet** metric losses on the latent space,
    weighted by black-box value (metrics.py:21-216) — points with similar
    objective pull together, dissimilar push apart,
  * rank-based data reweighting for weighted retraining
    (robust_opt_scripts/*: w_i ∝ 1 / (k·N + rank_i)).

Training is one jitted optax scan; the whole VAE finetune runs on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["VAE", "VAEState", "train_vae", "rank_weights", "metric_loss"]


class Encoder(nn.Module):
    latent_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.relu(nn.Dense(self.hidden)(h))
        mu = nn.Dense(self.latent_dim)(h)
        log_sigma = nn.Dense(self.latent_dim)(h)
        return mu, jnp.clip(log_sigma, -6.0, 2.0)


class Decoder(nn.Module):
    out_dim: int
    hidden: int = 64
    categorical_dims: Tuple[int, ...] = ()  # cardinalities for cat outputs

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.hidden)(z))
        h = nn.relu(nn.Dense(self.hidden)(h))
        if self.categorical_dims:
            logits = [nn.Dense(c)(h) for c in self.categorical_dims]
            return logits
        return nn.Dense(self.out_dim)(h)


class VAE(nn.Module):
    latent_dim: int
    out_dim: int
    hidden: int = 64
    categorical_dims: Tuple[int, ...] = ()

    def setup(self):
        self.encoder = Encoder(self.latent_dim, self.hidden)
        self.decoder = Decoder(self.out_dim, self.hidden, self.categorical_dims)

    def __call__(self, x, key):
        mu, log_sigma = self.encoder(x)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(key, mu.shape)
        return self.decoder(z), mu, log_sigma

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


class VAEState(NamedTuple):
    params: dict
    latent_dim: int


def rank_weights(y: np.ndarray, k: float = 1e-3) -> np.ndarray:
    """w_i ∝ 1 / (k·N + rank_i(y)) — lower y (better) → higher weight."""
    y = np.asarray(y).ravel()
    ranks = np.argsort(np.argsort(y))  # 0 = best (minimization)
    w = 1.0 / (k * len(y) + ranks)
    return w / w.sum() * len(y)


def metric_loss(
    z_mu: jnp.ndarray,
    y: jnp.ndarray,
    margin: float = 1.0,
    y_eps: float = 0.2,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Soft contrastive loss on latent means: pairs with |Δy| < y_eps are
    positives (pulled), others negatives (pushed beyond margin).  ``mask``
    (B,) excludes padded rows from all pairs."""
    d2 = jnp.sum((z_mu[:, None, :] - z_mu[None, :, :]) ** 2, axis=-1)
    d = jnp.sqrt(d2 + 1e-9)
    dy = jnp.abs(y[:, None, 0] - y[None, :, 0])
    pos = (dy < y_eps).astype(z_mu.dtype)
    neg = 1.0 - pos
    if mask is not None:
        pair = mask.astype(z_mu.dtype)[:, None] * mask.astype(z_mu.dtype)[None, :]
        pos = pos * pair
        neg = neg * pair
    eye = jnp.eye(len(y), dtype=z_mu.dtype)
    pos = pos * (1 - eye)
    loss_pos = pos * d2
    loss_neg = neg * jnp.maximum(margin - d, 0.0) ** 2
    denom = jnp.maximum(jnp.sum(pos) + jnp.sum(neg), 1.0)
    return (jnp.sum(loss_pos) + jnp.sum(loss_neg)) / denom


@partial(
    jax.jit,
    static_argnames=("model", "n_steps", "beta", "metric_weight"),
)
def train_vae(
    model: VAE,
    params,
    key: jax.Array,
    X: jnp.ndarray,
    y: jnp.ndarray,
    weights: jnp.ndarray,
    n_steps: int = 200,
    beta: float = 1e-2,
    metric_weight: float = 1.0,
    lr: float = 1e-3,
    labeled: Optional[jnp.ndarray] = None,
):
    """Weighted ELBO + metric-loss finetuning as one jitted scan.

    ``labeled`` (B,) restricts the metric loss to rows with a real
    black-box value — the T-LBO **semi-supervised** mode (reference
    robust_opt_scripts/robust_opt_*.py ``--semi-supervised``: the VAE is
    retrained on labeled + unlabeled structures, while value-dependent
    terms see only the labeled subset).  Default: every weighted row.
    """
    opt = optax.adam(lr)
    metric_mask = (weights > 0) if labeled is None else (labeled & (weights > 0))

    def loss_fn(p, k):
        out, mu, log_sigma = model.apply({"params": p}, X, k)
        if model.categorical_dims:
            rec = 0.0
            for i, logits in enumerate(out):
                tgt = X[:, i].astype(jnp.int32)  # X stores codes per column
                rec += -jax.nn.log_softmax(logits)[jnp.arange(len(tgt)), tgt]
        else:
            rec = jnp.sum((out - X) ** 2, axis=-1)
        kl = 0.5 * jnp.sum(
            jnp.exp(2 * log_sigma) + mu**2 - 1.0 - 2 * log_sigma, axis=-1
        )
        elbo_term = jnp.mean(weights * (rec + beta * kl))
        m = metric_loss(mu, y, mask=metric_mask)
        return elbo_term + metric_weight * m

    def step(carry, _):
        p, st, k = carry
        k, ks = jax.random.split(k)
        val, g = jax.value_and_grad(loss_fn)(p, ks)
        up, st = opt.update(g, st, p)
        p = jax.tree.map(lambda a, b: a + b, p, up)
        return (p, st, k), val

    (params, _, _), losses = jax.lax.scan(
        step, (params, opt.init(params), key), None, length=n_steps
    )
    return params, losses
