"""Deep ensemble surrogate — all members trained in one vmapped program.

Parity: reference ``DeepEnsemble`` (HEBO/hebo/models/nn/deep_ensemble.py:
17-238): N MLPs with mean+variance heads trained on NLL (or MSE), L1
regularization, optional bootstrap resampling per member, Thompson
sampling by round-robin over members (``sample_f``).

TPU-native: the reference parallelizes members with a multiprocessing
Pool (deep_ensemble.py:82); here the member axis is a ``vmap`` batch axis
— one jitted program trains the whole ensemble simultaneously on the MXU,
and the same axis shards across chips with shard_map (SURVEY.md §2.9 P1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import BaseModel, register_model

__all__ = ["DeepEnsemble"]


class MLPParams(NamedTuple):
    w: Tuple[jnp.ndarray, ...]
    b: Tuple[jnp.ndarray, ...]


def _init_mlp(key, sizes):
    ws, bs = [], []
    for i, (din, dout) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        scale = jnp.sqrt(2.0 / din)
        ws.append(scale * jax.random.normal(k, (din, dout), jnp.float32))
        bs.append(jnp.zeros(dout, jnp.float32))
    return MLPParams(tuple(ws), tuple(bs))


def _mlp_forward(p: MLPParams, x):
    h = x
    for i, (w, b) in enumerate(zip(p.w, p.b)):
        h = h @ w + b
        if i < len(p.w) - 1:
            h = jax.nn.relu(h)
    mu = h[:, :1]
    var = jax.nn.softplus(h[:, 1:2]) + 1e-6
    return mu, var


@register_model("deep_ensemble")
class DeepEnsemble(BaseModel):
    support_ts = True
    support_grad = True

    def __init__(self, space, num_out=1, **conf):
        super().__init__(space, num_out, **conf)
        assert num_out == 1
        self.num_ensembles = conf.get("num_ensembles", 5)
        self.hidden = conf.get("num_hiddens", 64)
        self.num_layers = conf.get("num_layers", 2)
        self.num_epochs = conf.get("num_epochs", 100)
        self.lr = conf.get("lr", 1e-2)
        self.l1 = conf.get("l1", 1e-3)
        self.bootstrap = conf.get("bootstrap", True)
        self.loss_name = conf.get("loss", "nll")  # 'nll' | 'mse'
        self._seed = conf.get("seed", 0)
        self._fit_jit = {}
        self.params = None
        self._x_stats = None
        self._y_stats = None
        self._one_hot_dims = None

    # ------------------------------------------------------------- features
    def _featurize(self, X: np.ndarray) -> np.ndarray:
        """Numeric cols + one-hot categoricals (reference OneHotTransform,
        models/layers.py:40-60)."""
        space = self.space
        parts = [X[:, space.numeric_dims + space.perm_dims].astype(np.float32)]
        for c in space.cat_dims:
            n = int(space.num_categories[c])
            oh = np.zeros((len(X), n), np.float32)
            oh[np.arange(len(X)), X[:, c].astype(int)] = 1.0
            parts.append(oh)
        return np.concatenate(parts, axis=1)

    def _get_fit_fn(self, n, d):
        key_ = (n, d)
        if key_ not in self._fit_jit:
            E = self.num_ensembles
            sizes = [d] + [self.hidden] * self.num_layers + [2]
            lr, l1, epochs = self.lr, self.l1, self.num_epochs
            loss_name = self.loss_name

            import optax

            opt = optax.adam(lr)

            def member_loss(p, x, y, w):
                mu, var = _mlp_forward(p, x)
                if loss_name == "nll":
                    nll = 0.5 * (jnp.log(var) + (y - mu) ** 2 / var)
                else:
                    nll = (y - mu) ** 2
                reg = sum(jnp.sum(jnp.abs(wi)) for wi in p.w)
                return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1.0) + l1 * reg

            def fit_fn(key, X, y, w):
                # w: (E, N) per-member bootstrap weights
                keys = jax.random.split(key, E)
                params0 = jax.vmap(lambda k: _init_mlp(k, sizes))(keys)

                def train_one(p0, wi):
                    st = opt.init(p0)

                    def step(carry, _):
                        p, s = carry
                        g = jax.grad(member_loss)(p, X, y, wi)
                        up, s = opt.update(g, s, p)
                        p = jax.tree.map(lambda a, b: a + b, p, up)
                        return (p, s), None

                    (pf, _), _ = jax.lax.scan(step, (p0, st), None, length=epochs)
                    return pf

                return jax.vmap(train_one)(params0, w)

            self._fit_jit[key_] = jax.jit(fit_fn)
        return self._fit_jit[key_]

    def fit(self, X, y):
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64).reshape(len(X), 1)
        ok = np.isfinite(y[:, 0]) & np.all(np.isfinite(X), axis=1)
        X, y = X[ok], y[ok]
        F = self._featurize(X)
        mu_x, sd_x = F.mean(0), np.maximum(F.std(0), 1e-8)
        mu_y, sd_y = float(y.mean()), max(float(y.std()), 1e-8)
        self._x_stats, self._y_stats = (mu_x, sd_x), (mu_y, sd_y)
        Fs = (F - mu_x) / sd_x
        ys = (y - mu_y) / sd_y
        rng = np.random.default_rng(self._seed)
        self._seed += 1
        n = len(Fs)
        if self.bootstrap:
            w = np.stack(
                [
                    np.bincount(rng.integers(0, n, n), minlength=n)
                    for _ in range(self.num_ensembles)
                ]
            ).astype(np.float32)
        else:
            w = np.ones((self.num_ensembles, n), np.float32)
        fit_fn = self._get_fit_fn(n, Fs.shape[1])
        self.params = fit_fn(
            jax.random.PRNGKey(self._seed),
            jnp.asarray(Fs, jnp.float32),
            jnp.asarray(ys, jnp.float32),
            jnp.asarray(w),
        )
        return self

    def _predict_scaled(self, Fs):
        mus, vars_ = jax.vmap(lambda p: _mlp_forward(p, Fs))(self.params)
        mu = jnp.mean(mus, axis=0)
        var = jnp.mean(vars_ + mus**2, axis=0) - mu**2
        return mu, jnp.maximum(var, 1e-8)

    def predict(self, X):
        F = self._featurize(np.asarray(X, np.float64))
        (mu_x, sd_x), (mu_y, sd_y) = self._x_stats, self._y_stats
        Fs = jnp.asarray((F - mu_x) / sd_x, jnp.float32)
        mu, var = self._predict_scaled(Fs)
        return np.asarray(mu) * sd_y + mu_y, np.asarray(var) * sd_y**2

    # pure-state protocol for jitted acquisition loops
    @property
    def state(self):
        (mu_x, sd_x), (mu_y, sd_y) = self._x_stats, self._y_stats
        return (
            self.params,
            jnp.asarray(mu_x),
            jnp.asarray(sd_x),
            jnp.float32(mu_y),
            jnp.float32(sd_y),
        )

    def predict_pure(self, state, Xs):
        params, mu_x, sd_x, mu_y, sd_y = state
        space = self.space
        parts = [Xs[:, list(space.numeric_dims) + list(space.perm_dims)]]
        for c in space.cat_dims:
            n = int(space.num_categories[c])
            parts.append(jax.nn.one_hot(Xs[:, c].astype(jnp.int32), n))
        F = jnp.concatenate(parts, axis=1)
        Fs = (F - mu_x) / sd_x
        mus, vars_ = jax.vmap(lambda p: _mlp_forward(p, Fs))(params)
        mu = jnp.mean(mus, axis=0)
        var = jnp.maximum(jnp.mean(vars_ + mus**2, axis=0) - mu**2, 1e-8)
        return mu * sd_y + mu_y, var * sd_y**2

    def sample_f(self, n_samples: int = 1, seed: int = 0):
        """Thompson sampling: round-robin over ensemble members
        (reference deep_ensemble.py sample_f)."""

        def f(Xq):
            F = self._featurize(np.asarray(Xq, np.float64))
            (mu_x, sd_x), (mu_y, sd_y) = self._x_stats, self._y_stats
            Fs = jnp.asarray((F - mu_x) / sd_x, jnp.float32)
            mus, _ = jax.vmap(lambda p: _mlp_forward(p, Fs))(self.params)
            idx = [(seed + i) % self.num_ensembles for i in range(n_samples)]
            return np.asarray(mus)[idx] * sd_y + mu_y

        return f

    @property
    def noise(self):
        return np.zeros(1)
