"""Task-specific VAE families for latent-space BO (T-LBO task decoders).

Parity targets (T-LBO weighted_retraining/):
  * topology image VAE — the reference optimizes 40x40 topology images
    through a conv VAE (weighted_retraining task VAEs,
    models.py:18-486 + robust_opt_scripts/robust_opt_topology.py),
  * chem junction-tree VAE / expression grammar VAE — sequential
    construction decoders (chem/jtnn/, ~2k LoC; expression task).  The
    jtnn depends on rdkit chemistry (unavailable in this image); the
    capability it provides to the BO loop — an autoregressive decoder that
    emits a structured object token-by-token from a latent code — is
    provided here as a GRU sequence VAE.  Chemistry-specific validity
    checks are the task's business (cf. AntBO CDR constraints pattern).

TPU-native design: encoders/decoders are flax modules; training is one
jitted optax scan (shared with latent/vae.py); the autoregressive decode
rollout is a ``lax.scan`` with static max length (no data-dependent python
loops), so batched decoding of an EA population is a single device program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .vae import metric_loss, rank_weights

__all__ = [
    "TopologyVAE", "train_topology_vae", "topology_encode", "topology_decode",
    "SeqVAE", "train_seq_vae", "seq_encode", "seq_decode", "ImageLatentBO",
]


# ============================================================ topology (conv)
class ConvEncoder(nn.Module):
    latent_dim: int
    width: int = 16

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1)
        h = nn.relu(nn.Conv(self.width, (4, 4), strides=(2, 2))(x))
        h = nn.relu(nn.Conv(2 * self.width, (4, 4), strides=(2, 2))(h))
        h = nn.relu(nn.Conv(4 * self.width, (4, 4), strides=(2, 2))(h))
        h = h.reshape((h.shape[0], -1))
        mu = nn.Dense(self.latent_dim)(h)
        log_sigma = nn.Dense(self.latent_dim)(h)
        return mu, jnp.clip(log_sigma, -6.0, 2.0)


class ConvDecoder(nn.Module):
    image_hw: Tuple[int, int]
    width: int = 16

    @nn.compact
    def __call__(self, z):
        H, W = self.image_hw
        h0, w0 = -(-H // 8), -(-W // 8)  # ceil: upsampled size >= H, W, then crop
        h = nn.relu(nn.Dense(h0 * w0 * 4 * self.width)(z))
        h = h.reshape((-1, h0, w0, 4 * self.width))
        h = nn.relu(nn.ConvTranspose(2 * self.width, (4, 4), strides=(2, 2))(h))
        h = nn.relu(nn.ConvTranspose(self.width, (4, 4), strides=(2, 2))(h))
        logits = nn.ConvTranspose(1, (4, 4), strides=(2, 2))(h)
        # crop in case H/W are not multiples of 8
        return logits[:, :H, :W, :]


class TopologyVAE(nn.Module):
    """Bernoulli conv VAE over (H, W) binary/grayscale structure images."""

    latent_dim: int = 8
    image_hw: Tuple[int, int] = (40, 40)
    width: int = 16

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim, self.width)
        self.decoder = ConvDecoder(self.image_hw, self.width)

    def __call__(self, x, key):
        mu, log_sigma = self.encoder(x)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(key, mu.shape)
        return self.decoder(z), mu, log_sigma

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


@partial(jax.jit, static_argnames=("model", "n_steps", "beta", "metric_weight"))
def train_topology_vae(
    model: TopologyVAE,
    params,
    key: jax.Array,
    X: jnp.ndarray,  # (B, H, W, 1) in [0, 1]
    y: jnp.ndarray,  # (B, 1)
    weights: jnp.ndarray,  # (B,)
    n_steps: int = 200,
    beta: float = 1e-2,
    metric_weight: float = 1.0,
    lr: float = 1e-3,
):
    """Weighted Bernoulli ELBO + latent metric loss, one jitted scan."""
    opt = optax.adam(lr)

    def loss_fn(p, k):
        logits, mu, log_sigma = model.apply({"params": p}, X, k)
        rec = jnp.sum(
            optax.sigmoid_binary_cross_entropy(logits[..., 0], X[..., 0]),
            axis=(-2, -1),
        )
        kl = 0.5 * jnp.sum(
            jnp.exp(2 * log_sigma) + mu**2 - 1.0 - 2 * log_sigma, axis=-1
        )
        return jnp.mean(weights * (rec + beta * kl)) + metric_weight * metric_loss(mu, y, mask=weights > 0)

    def step(carry, _):
        p, st, k = carry
        k, ks = jax.random.split(k)
        val, g = jax.value_and_grad(loss_fn)(p, ks)
        up, st = opt.update(g, st, p)
        return (jax.tree.map(lambda a, b: a + b, p, up), st, k), val

    (params, _, _), losses = jax.lax.scan(
        step, (params, opt.init(params), key), None, length=n_steps
    )
    return params, losses


def topology_encode(model: TopologyVAE, params, X: np.ndarray) -> np.ndarray:
    mu, _ = model.apply({"params": params}, jnp.asarray(X, jnp.float32), method=model.encode)
    return np.asarray(mu)


def topology_decode(model: TopologyVAE, params, Z: np.ndarray) -> np.ndarray:
    logits = model.apply({"params": params}, jnp.asarray(Z, jnp.float32), method=model.decode)
    return np.asarray(jax.nn.sigmoid(logits))


# ======================================================= sequences (GRU AR)
class SeqEncoder(nn.Module):
    vocab: int
    latent_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, tokens):  # (B, L) int32
        emb = nn.Embed(self.vocab, self.hidden)(tokens)
        carry, _ = nn.RNN(nn.GRUCell(self.hidden), return_carry=True)(emb)
        mu = nn.Dense(self.latent_dim)(carry)
        log_sigma = nn.Dense(self.latent_dim)(carry)
        return mu, jnp.clip(log_sigma, -6.0, 2.0)


class SeqDecoder(nn.Module):
    """Autoregressive GRU decoder: token t is conditioned on (z, token t-1)
    — the sequential-construction decoding pattern of the reference's
    grammar/junction-tree decoders, with fixed max length."""

    vocab: int
    length: int
    hidden: int = 64

    @nn.compact
    def __call__(self, z, tokens: Optional[jnp.ndarray] = None):
        """Teacher-forced logits if ``tokens`` given, else greedy rollout."""
        B = z.shape[0]
        emb = nn.Embed(self.vocab + 1, self.hidden)  # +1 for BOS
        cell = nn.GRUCell(self.hidden)
        head = nn.Dense(self.vocab)
        z_proj = nn.Dense(self.hidden)(z)
        carry0 = jnp.tanh(z_proj)
        bos = jnp.full((B,), self.vocab, jnp.int32)

        if tokens is not None:
            prev = jnp.concatenate([bos[:, None], tokens[:, :-1]], axis=1)
            x = emb(prev) + z_proj[:, None, :]
            hs = nn.RNN(cell)(x, initial_carry=carry0)
            return head(hs)  # (B, L, vocab)

        # greedy rollout: static max length, unrolled by XLA into one
        # program (the params-carrying while-loop would need nn.scan over a
        # Module; for L <= ~64 unrolling compiles fine and fuses better)
        outs = []
        c, prev_tok = carry0, bos
        for _t in range(self.length):
            x = emb(prev_tok) + z_proj
            c, h = cell(c, x)
            logits = head(h)
            prev_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            outs.append(prev_tok)
        return jnp.stack(outs, axis=1)  # (B, L)


class SeqVAE(nn.Module):
    vocab: int
    length: int
    latent_dim: int = 8
    hidden: int = 64

    def setup(self):
        self.encoder = SeqEncoder(self.vocab, self.latent_dim, self.hidden)
        self.decoder = SeqDecoder(self.vocab, self.length, self.hidden)

    def __call__(self, tokens, key):
        mu, log_sigma = self.encoder(tokens)
        z = mu + jnp.exp(log_sigma) * jax.random.normal(key, mu.shape)
        return self.decoder(z, tokens), mu, log_sigma

    def encode(self, tokens):
        return self.encoder(tokens)

    def decode(self, z):
        return self.decoder(z, None)


@partial(jax.jit, static_argnames=("model", "n_steps", "beta", "metric_weight"))
def train_seq_vae(
    model: SeqVAE,
    params,
    key: jax.Array,
    tokens: jnp.ndarray,  # (B, L) int32
    y: jnp.ndarray,
    weights: jnp.ndarray,
    n_steps: int = 200,
    beta: float = 1e-2,
    metric_weight: float = 1.0,
    lr: float = 1e-3,
):
    opt = optax.adam(lr)

    def loss_fn(p, k):
        logits, mu, log_sigma = model.apply({"params": p}, tokens, k)
        logp = jax.nn.log_softmax(logits)
        rec = -jnp.sum(
            jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0], axis=-1
        )
        kl = 0.5 * jnp.sum(
            jnp.exp(2 * log_sigma) + mu**2 - 1.0 - 2 * log_sigma, axis=-1
        )
        return jnp.mean(weights * (rec + beta * kl)) + metric_weight * metric_loss(mu, y, mask=weights > 0)

    def step(carry, _):
        p, st, k = carry
        k, ks = jax.random.split(k)
        val, g = jax.value_and_grad(loss_fn)(p, ks)
        up, st = opt.update(g, st, p)
        return (jax.tree.map(lambda a, b: a + b, p, up), st, k), val

    (params, _, _), losses = jax.lax.scan(
        step, (params, opt.init(params), key), None, length=n_steps
    )
    return params, losses


def seq_encode(model: SeqVAE, params, tokens: np.ndarray) -> np.ndarray:
    mu, _ = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32), method=model.encode)
    return np.asarray(mu)


def seq_decode(model: SeqVAE, params, Z: np.ndarray) -> np.ndarray:
    toks = model.apply({"params": params}, jnp.asarray(Z, jnp.float32), method=model.decode)
    return np.asarray(toks)


# ================================================== latent BO over images
class ImageLatentBO:
    """T-LBO topology loop: weighted-retrained conv VAE + GP-EI in the
    latent box; black box scores decoded images (robust_opt_topology.py).

    Ask/tell over images: ``suggest(n) -> (n, H, W, 1) decoded images``,
    ``observe(images, y)``.
    """

    def __init__(
        self,
        image_hw: Tuple[int, int] = (40, 40),
        latent_dim: int = 8,
        latent_bound: float = 3.0,
        retrain_every: int = 8,
        vae_steps: int = 150,
        model_config: Optional[dict] = None,
        seed: int = 0,
    ):
        from ..design_space import DesignSpace

        self.image_hw = image_hw
        self.latent_dim = latent_dim
        self.retrain_every = retrain_every
        self.vae_steps = vae_steps
        self.model_config = model_config or {"num_epochs": 30}
        self._key = jax.random.PRNGKey(seed)
        self.vae = TopologyVAE(latent_dim=latent_dim, image_hw=image_hw)
        self._key, k = jax.random.split(self._key)
        dummy = jnp.zeros((1,) + image_hw + (1,), jnp.float32)
        self.params = self.vae.init({"params": k}, dummy, k)["params"]
        self.latent_space = DesignSpace(
            [
                {"name": f"z{i}", "type": "num", "lb": -latent_bound, "ub": latent_bound}
                for i in range(latent_dim)
            ]
        )
        self.X_img: Optional[np.ndarray] = None
        self.y: Optional[np.ndarray] = None
        self.gp = None
        self._evo = None
        self._n_suggests = 0

    def observe(self, images: np.ndarray, y: np.ndarray):
        images = np.asarray(images, np.float32).reshape((-1,) + self.image_hw + (1,))
        y = np.asarray(y, np.float32).reshape(len(images), 1)
        self.X_img = images if self.X_img is None else np.concatenate([self.X_img, images])
        self.y = y if self.y is None else np.concatenate([self.y, y])

    def _retrain(self):
        from ..utils.dtypes import pad_bucket

        ok = np.isfinite(self.y[:, 0])
        Xv, yv = self.X_img[ok], self.y[ok]
        w = rank_weights(yv[:, 0])
        # pad batch to bucket with zero-weight rows: ONE compile per bucket
        n = len(Xv)
        n_pad = pad_bucket(max(n, 2))
        Xp = np.zeros((n_pad,) + Xv.shape[1:], np.float32)
        yp = np.zeros((n_pad, 1), np.float32)
        wp = np.zeros((n_pad,), np.float32)
        Xp[:n], yp[:n], wp[:n] = Xv, yv, w
        self._key, k = jax.random.split(self._key)
        self.params, _ = train_topology_vae(
            self.vae, self.params, k,
            jnp.asarray(Xp), jnp.asarray(yp), jnp.asarray(wp),
            n_steps=self.vae_steps,
        )

    def suggest(self, n: int = 1) -> np.ndarray:
        from ..acquisitions.acq import EI, AcqParams
        from ..acq_optimizers.evolution import EvolutionOpt
        from ..models import get_model

        self._n_suggests += 1
        n_obs = 0 if self.y is None else len(self.y)
        if n_obs < 2 * self.latent_dim:
            self._key, k = jax.random.split(self._key)
            Z = np.asarray(jax.random.normal(k, (n, self.latent_dim)))
            return topology_decode(self.vae, self.params, Z)

        if self._n_suggests % self.retrain_every == 1:
            self._retrain()
        ok = np.isfinite(self.y[:, 0])
        Z = topology_encode(self.vae, self.params, self.X_img[ok])
        ys = (self.y[ok] - self.y[ok].mean()) / max(float(self.y[ok].std()), 1e-12)
        if self.gp is None:
            self.gp = get_model("gp", self.latent_space, num_out=1, **self.model_config)
        self.gp.fit(Z, ys)
        if self._evo is None:
            self._evo = EvolutionOpt(self.latent_space, EI(), pop=32, iters=24)
        pop_Z, pop_F = self._evo.optimize(
            model=self.gp,
            acq_params=AcqParams(tau=jnp.float32(float(np.min(ys)))),
            initial_suggest=Z[np.argmin(ys[:, 0])][None, :],
            return_pop=True,
            seed=n_obs,
        )
        order = np.argsort(pop_F[:, 0])[:n]
        return topology_decode(self.vae, self.params, pop_Z[order])
