"""Deep-kernel GP: learned MLP feature extractor ahead of the kernel.

Parity: reference ``SVIDKL`` (HEBO/hebo/models/gp/svidkl.py:55 — SVGP +
learned feature extractor) and NAP's ``DeepKernelGP`` / FSBO baseline
(NAP/nap/policies/fsbo.py:86-476).  The extractor weights are ordinary GP
hyperparameters optimized jointly with the marginal likelihood — one
jitted program, MLP forward = MXU matmuls.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import register_model
from .gp import GP, GPCore, GPData, GPParams

__all__ = ["DKLGP"]


class DKLCore(GPCore):
    """GPCore whose feature map is scaled-inputs → 2-layer MLP.

    The MLP weights are packed into ``params.emb`` (reused storage:
    (n_weights, 1)); layer shapes are static."""

    def __init__(self, *args, feat_dim: int = 8, feat_hidden: int = 32, **kw):
        super().__init__(*args, **kw)
        self.feat_dim = feat_dim
        self.feat_hidden = feat_hidden
        d_in = self.d_num + len(self.cat_dims)
        self._shapes = [
            (d_in, feat_hidden), (feat_hidden,),
            (feat_hidden, feat_dim), (feat_dim,),
        ]
        self._n_w = sum(int(np.prod(s)) for s in self._shapes)
        # ARD over the learned features
        self.n_feat_dims = feat_dim
        self.n_cat_param = 0
        self.d_feat = feat_dim

    def _unpack(self, flat):
        ws, o = [], 0
        for s in self._shapes:
            n = int(np.prod(s))
            ws.append(flat[o : o + n].reshape(s))
            o += n
        return ws

    def features(self, params: GPParams, X: jnp.ndarray, data: GPData):
        parts = []
        if self.d_num:
            xn = X[:, list(self.numeric_dims)]
            u = jnp.clip((xn - data.x_lb) / data.x_span, 0.0, 1.0)
            parts.append(2.0 * u - 1.0)
        for c in self.cat_dims:  # normalized codes as extra inputs
            parts.append(
                (X[:, c : c + 1] / jnp.maximum(
                    float(self.num_categories[self.cat_dims.index(c)]) - 1.0, 1.0
                )) * 2.0 - 1.0
            )
        h = jnp.concatenate(parts, axis=-1)
        w1, b1, w2, b2 = self._unpack(params.emb[:, 0])
        h = jnp.tanh(h @ w1 + b1)
        return h @ w2 + b2

    def init_params(self, key, data):
        kw, kl = jax.random.split(key)
        flat = 0.3 * jax.random.normal(kw, (self._n_w, 1), jnp.float32)
        p0 = GPParams(
            log_ls=jnp.zeros((self.feat_dim,), jnp.float32)
            + 0.1 * jax.random.normal(kl, (self.feat_dim,), jnp.float32),
            log_sc=jnp.asarray(0.0, jnp.float32),
            log_noise=jnp.asarray(math.log(1e-2), jnp.float32),
            mean=jnp.asarray(0.0, jnp.float32),
            emb=flat,
            log_wa=jnp.zeros((self.d_num,), jnp.float32),
            log_wb=jnp.zeros((self.d_num,), jnp.float32),
        )
        return p0

    def log_prior(self, params):
        lp = super().log_prior(params)
        return lp  # emb prior in super covers the MLP weights


@register_model("dkl")
class DKLGP(GP):
    def __init__(self, space, num_out: int = 1, **conf):
        super().__init__(space, num_out=num_out, **conf)
        num_cats = [int(space.num_categories[c]) for c in space.cat_dims]
        self.core = DKLCore(
            numeric_dims=tuple(space.numeric_dims) + tuple(space.perm_dims),
            cat_dims=tuple(space.cat_dims),
            num_categories=tuple(num_cats),
            kernel=conf.get("kernel", "matern32"),
            optimizer=conf.get("optimizer", "adam"),
            n_steps=conf.get("num_epochs", 150),
            lr=conf.get("lr", 0.01),
            n_ensemble=conf.get("n_ensemble", 1),
            feat_dim=conf.get("feat_dim", 8),
            feat_hidden=conf.get("feat_hidden", 32),
        )
        self._fit_jit = {}
        self._pred_jit = {}
