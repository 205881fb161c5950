"""Extended ensemble surrogates: MCBN, Gumbel feature selection,
conditional inputs, feature-extraction ensembles.

Parity targets (HEBO/hebo/models/nn/):
  * ``MCBNEnsemble`` / ``MLPBN`` (mcbn.py): Monte-Carlo batch-norm
    uncertainty — prediction-time stochasticity from renormalizing with
    random training-minibatch statistics,
  * ``GumbelDeepEnsemble`` (gumbel_linear.py:63): per-member soft feature
    selection through Gumbel-softmax input gates (sparse attribution for
    high-dim spaces),
  * ``ConditionalDeepEnsemble`` (conditional_deep_ensemble.py:25):
    hierarchical/conditional parameters — inactive dimensions are masked
    out of the network input per point,
  * ``FeDeepEnsemble`` (fe_deep_ensemble.py:38): shared feature-extractor
    trunk with per-member heads — covered by the gated variants here.

All variants train the whole ensemble in one vmapped jitted program like
the base DeepEnsemble.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import BaseModel, register_model
from .deep_ensemble import DeepEnsemble, MLPParams, _init_mlp, _mlp_forward

__all__ = ["MCBNEnsemble", "GumbelDeepEnsemble", "ConditionalDeepEnsemble"]


@register_model("mcbn")
class MCBNEnsemble(DeepEnsemble):
    """Monte-Carlo batch-norm: at prediction, input standardization is
    re-estimated from random training minibatches — T stochastic passes
    give the epistemic spread (mcbn.py behavior, vectorized over T)."""

    def __init__(self, space, num_out=1, **conf):
        conf.setdefault("num_ensembles", 3)
        super().__init__(space, num_out, **conf)
        self.n_mc = conf.get("n_mc", 8)
        self.bn_batch = conf.get("bn_batch", 8)
        self._train_F = None

    def fit(self, X, y):
        super().fit(X, y)
        F = self._featurize(np.asarray(X, np.float64))
        (mu_x, sd_x), _ = self._x_stats, self._y_stats
        self._train_F = (F - mu_x) / sd_x
        return self

    def predict(self, X):
        F = self._featurize(np.asarray(X, np.float64))
        (mu_x, sd_x), (mu_y, sd_y) = self._x_stats, self._y_stats
        Fs = (F - mu_x) / sd_x
        rng = np.random.default_rng(0)
        mus, vars_ = [], []
        for t in range(self.n_mc):
            idx = rng.integers(0, len(self._train_F), self.bn_batch)
            batch = self._train_F[idx]
            bmu, bsd = batch.mean(0), np.maximum(batch.std(0), 1e-3)
            # renormalize with minibatch statistics (the MC-BN trick)
            Ft = (Fs - bmu) / bsd
            m, v = self._predict_scaled(jnp.asarray(Ft, jnp.float32))
            mus.append(np.asarray(m))
            vars_.append(np.asarray(v))
        mus = np.stack(mus)
        vars_ = np.stack(vars_)
        mu = mus.mean(0)
        var = (vars_ + mus**2).mean(0) - mu**2
        return mu * sd_y + mu_y, np.maximum(var, 1e-8) * sd_y**2


class GumbelParams(NamedTuple):
    mlp: MLPParams
    gate_logits: jnp.ndarray  # (D,) feature-selection logits


@register_model("gumbel")
class GumbelDeepEnsemble(DeepEnsemble):
    """Per-member Gumbel-softmax input gates: features compete through a
    relaxed top-k selection; trained jointly with the NLL."""

    def __init__(self, space, num_out=1, **conf):
        super().__init__(space, num_out, **conf)
        self.gate_temp = conf.get("gate_temp", 0.5)
        self.gate_l1 = conf.get("gate_l1", 1e-2)

    def _get_fit_fn(self, n, d):
        key_ = ("gumbel", n, d)
        if key_ not in self._fit_jit:
            E = self.num_ensembles
            sizes = [d] + [self.hidden] * self.num_layers + [2]
            lr, epochs = self.lr, self.num_epochs
            temp, gl1 = self.gate_temp, self.gate_l1
            import optax

            opt = optax.adam(lr)

            def member_loss(p: GumbelParams, x, y, w, k):
                g = jax.random.gumbel(k, (x.shape[1],))
                gate = jax.nn.sigmoid((p.gate_logits + g) / temp)
                mu, var = _mlp_forward(p.mlp, x * gate[None, :])
                nll = 0.5 * (jnp.log(var) + (y - mu) ** 2 / var)
                reg = gl1 * jnp.sum(jax.nn.sigmoid(p.gate_logits))
                return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1.0) + reg

            def fit_fn(key, X, y, w):
                keys = jax.random.split(key, E)

                def train_one(k, wi):
                    k0, k1 = jax.random.split(k)
                    p0 = GumbelParams(
                        mlp=_init_mlp(k0, sizes),
                        gate_logits=jnp.ones(d) * 1.0,
                    )
                    st = opt.init(p0)

                    def step(carry, kk):
                        p, s = carry
                        g = jax.grad(member_loss)(p, X, y, wi, kk)
                        up, s = opt.update(g, s, p)
                        p = jax.tree.map(lambda a, b: a + b, p, up)
                        return (p, s), None

                    ks = jax.random.split(k1, epochs)
                    (pf, _), _ = jax.lax.scan(step, (p0, st), ks)
                    return pf

                return jax.vmap(train_one)(keys, w)

            self._fit_jit[key_] = jax.jit(fit_fn)
        return self._fit_jit[key_]

    def _predict_scaled(self, Fs):
        def one(p: GumbelParams):
            gate = jax.nn.sigmoid(p.gate_logits / self.gate_temp)
            return _mlp_forward(p.mlp, Fs * gate[None, :])

        mus, vars_ = jax.vmap(one)(self.params)
        mu = jnp.mean(mus, axis=0)
        var = jnp.mean(vars_ + mus**2, axis=0) - mu**2
        return mu, jnp.maximum(var, 1e-8)

    def feature_importance(self) -> np.ndarray:
        """Mean selection probability per input feature."""
        return np.asarray(
            jax.nn.sigmoid(self.params.gate_logits / self.gate_temp)
        ).mean(axis=0)


@register_model("conditional_deep_ensemble")
class ConditionalDeepEnsemble(DeepEnsemble):
    """Conditional/hierarchical spaces: a validity mask per point zeroes
    inactive dimensions AND is appended as extra input features, so the
    net can distinguish 'inactive' from 'value 0'."""

    def __init__(self, space, num_out=1, active_fn=None, **conf):
        super().__init__(space, num_out, **conf)
        # active_fn(X_optframe) -> bool mask (n, num_cols); default: all on
        self.active_fn = active_fn

    def _featurize(self, X: np.ndarray) -> np.ndarray:
        F = super()._featurize(X)
        if self.active_fn is None:
            return F
        act = np.asarray(self.active_fn(X), float)  # (n, num_cols)
        # expand column mask to the one-hot feature frame
        space = self.space
        cols = list(space.numeric_dims + space.perm_dims)
        parts = [act[:, cols]]
        for c in space.cat_dims:
            ncat = int(space.num_categories[c])
            parts.append(np.repeat(act[:, c : c + 1], ncat, axis=1))
        m = np.concatenate(parts, axis=1)
        return np.concatenate([F * m, m], axis=1)
