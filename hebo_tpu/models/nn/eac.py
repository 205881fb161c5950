"""EAC ensembles: embedding-alignment cells for NAS-like sequence spaces.

Parity: reference EAC family (HEBO/hebo/models/nn/eac/eac_model.py:22-196
+ 4 files, ~630 LoC): surrogates for architecture-like categorical
sequences built from an embedding "cell" — MLP, RNN, or Transformer
encoder over per-position embeddings — feeding mean+variance heads, used
as a deep ensemble.

TPU-native: the cell forward is pure jnp (GRU as a lax.scan; attention as
one fused einsum block); the ensemble trains vmapped like DeepEnsemble.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..base import BaseModel, register_model

__all__ = ["EACEnsemble"]


class EACParams(NamedTuple):
    emb: jnp.ndarray  # (total_cats, E)
    cell: tuple  # cell-specific weights
    head_w: jnp.ndarray
    head_b: jnp.ndarray


def _init_cell(key, cell_type, E, L, hidden):
    ks = jax.random.split(key, 8)
    s = lambda k, sh: 0.3 * jax.random.normal(k, sh, jnp.float32)
    if cell_type == "mlp":
        return (s(ks[0], (L * E, hidden)), jnp.zeros(hidden))
    if cell_type == "rnn":  # GRU
        return (
            s(ks[0], (E, 3 * hidden)), s(ks[1], (hidden, 3 * hidden)),
            jnp.zeros(3 * hidden),
        )
    if cell_type == "transformer":
        return (
            s(ks[0], (E, hidden)),  # in-proj
            s(ks[1], (hidden, hidden)), s(ks[2], (hidden, hidden)),
            s(ks[3], (hidden, hidden)),  # q, k, v
            s(ks[4], (hidden, hidden)),  # ff
        )
    raise ValueError(cell_type)


def _cell_forward(cell_type, cw, emb_seq):
    """emb_seq (B, L, E) → (B, hidden)."""
    if cell_type == "mlp":
        w, b = cw
        flat = emb_seq.reshape(emb_seq.shape[0], -1)
        return jax.nn.relu(flat @ w + b)
    if cell_type == "rnn":
        wx, wh, b = cw
        H = wh.shape[0]

        def gru_step(h, x):
            z = x @ wx + h @ wh + b
            r, u, n = jnp.split(z, 3, axis=-1)
            r, u = jax.nn.sigmoid(r), jax.nn.sigmoid(u)
            n = jnp.tanh(n * r)
            h = (1 - u) * n + u * h
            return h, None

        h0 = jnp.zeros((emb_seq.shape[0], H))
        h, _ = jax.lax.scan(gru_step, h0, jnp.swapaxes(emb_seq, 0, 1))
        return h
    if cell_type == "transformer":
        win, wq, wk, wv, wf = cw
        h = emb_seq @ win  # (B, L, H)
        q, k, v = h @ wq, h @ wk, h @ wv
        att = jax.nn.softmax(
            jnp.einsum("blh,bmh->blm", q, k) / jnp.sqrt(1.0 * h.shape[-1]),
            axis=-1,
        )
        h = h + jnp.einsum("blm,bmh->blh", att, v)
        h = h + jax.nn.relu(h @ wf)
        return jnp.mean(h, axis=1)
    raise ValueError(cell_type)


@register_model("eac")
class EACEnsemble(BaseModel):
    support_ts = True

    def __init__(self, space, num_out=1, **conf):
        super().__init__(space, num_out, **conf)
        assert num_out == 1
        assert space.cat_dims, "EAC expects a (mostly) categorical space"
        self.cell_type = conf.get("cell", "mlp")  # mlp | rnn | transformer
        self.E = conf.get("emb_dim", 8)
        self.hidden = conf.get("num_hiddens", 32)
        self.num_ensembles = conf.get("num_ensembles", 4)
        self.num_epochs = conf.get("num_epochs", 100)
        self.lr = conf.get("lr", 1e-2)
        self._seed = conf.get("seed", 0)
        self.L = len(space.cat_dims)
        cats = [int(space.num_categories[c]) for c in space.cat_dims]
        self.total = sum(cats)
        offs, acc = [], 0
        for c in cats:
            offs.append(acc)
            acc += c
        self._offs = np.asarray(offs, np.int64)
        self._fit = None
        self.params = None
        self._y_stats = (0.0, 1.0)

    def _codes(self, X):
        return np.asarray(X)[:, self.space.cat_dims].astype(np.int64)

    def _forward(self, p: EACParams, codes):
        flat_idx = codes + jnp.asarray(self._offs)[None, :]
        oh = jax.nn.one_hot(flat_idx, self.total, dtype=jnp.float32)
        emb_seq = jnp.einsum("blt,te->ble", oh, p.emb)
        h = _cell_forward(self.cell_type, p.cell, emb_seq)
        out = h @ p.head_w + p.head_b
        mu = out[:, :1]
        var = jax.nn.softplus(out[:, 1:2]) + 1e-6
        return mu, var

    def _init_member(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cell = _init_cell(k2, self.cell_type, self.E, self.L, self.hidden)
        return EACParams(
            emb=0.3 * jax.random.normal(k1, (self.total, self.E), jnp.float32),
            cell=cell,
            head_w=0.3 * jax.random.normal(k3, (self.hidden, 2), jnp.float32),
            head_b=jnp.zeros(2),
        )

    def fit(self, X, y):
        y = np.asarray(y, float).reshape(len(X), 1)
        ok = np.isfinite(y[:, 0])
        codes = jnp.asarray(self._codes(np.asarray(X)[ok]))
        yv = y[ok]
        mu_y, sd_y = float(yv.mean()), max(float(yv.std()), 1e-8)
        self._y_stats = (mu_y, sd_y)
        ys = jnp.asarray((yv - mu_y) / sd_y, jnp.float32)
        opt = optax.adam(self.lr)
        E, epochs = self.num_ensembles, self.num_epochs

        if self._fit is None:

            @jax.jit
            def fit_fn(key, codes, ys):
                keys = jax.random.split(key, E)

                def train_one(k):
                    p0 = self._init_member(k)
                    st = opt.init(p0)

                    def loss(p):
                        mu, var = self._forward(p, codes)
                        return jnp.mean(
                            0.5 * (jnp.log(var) + (ys - mu) ** 2 / var)
                        )

                    def step(carry, _):
                        p, s = carry
                        g = jax.grad(loss)(p)
                        up, s = opt.update(g, s, p)
                        return (jax.tree.map(lambda a, b: a + b, p, up), s), None

                    (pf, _), _ = jax.lax.scan(step, (p0, st), None, length=epochs)
                    return pf

                return jax.vmap(train_one)(keys)

            self._fit = fit_fn
        self.params = self._fit(jax.random.PRNGKey(self._seed), codes, ys)
        self._seed += 1
        return self

    def predict(self, X):
        codes = jnp.asarray(self._codes(X))
        mus, vars_ = jax.vmap(lambda p: self._forward(p, codes))(self.params)
        mu = jnp.mean(mus, axis=0)
        var = jnp.maximum(jnp.mean(vars_ + mus**2, axis=0) - mu**2, 1e-8)
        mu_y, sd_y = self._y_stats
        return np.asarray(mu) * sd_y + mu_y, np.asarray(var) * sd_y**2

    def sample_f(self, n_samples=1, seed=0):
        def f(Xq):
            codes = jnp.asarray(self._codes(Xq))
            mus, _ = jax.vmap(lambda p: self._forward(p, codes))(self.params)
            idx = [(seed + i) % self.num_ensembles for i in range(n_samples)]
            mu_y, sd_y = self._y_stats
            return np.asarray(mus)[idx] * sd_y + mu_y

        return f
