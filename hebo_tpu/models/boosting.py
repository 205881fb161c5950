"""Gradient-boosted oblivious-tree surrogate with uncertainty (CatBoost parity).

Parity target: reference ``CatBoost`` surrogate
(HEBO/hebo/models/boosting/catboost.py:18-62): RMSEWithUncertainty loss
(the model boosts BOTH a mean and a log-variance head on the Gaussian NLL),
``virtual_ensembles_predict(prediction_type='TotalUncertainty')`` — predictive
variance = knowledge uncertainty (variance of the mean across truncated
sub-ensembles) + data uncertainty (mean predicted noise variance) — and the
fit/predict BaseModel contract with NaN filtering.

TPU-native design (not a port; the reference delegates to the catboost C++
library):
* Oblivious (symmetric) trees — CatBoost's tree type — vectorize exactly:
  one (feature, bin) split per level, so a depth-T tree is T comparisons and
  a leaf index is a T-bit integer.  No pointer chasing, no ragged nodes.
* Histogram split search is ONE einsum per level: grad/hess sums per
  (leaf, feature, bin) via one-hot contraction, prefix-sum over bins gives
  every threshold's left/right statistics, a single argmax picks the split.
* The whole fit (R rounds x T levels) is a ``lax.scan`` over rounds inside
  one jitted program per (N-bucket, n_features); predictions for all R
  stages come from one cumulative sum, so virtual-ensemble uncertainty is a
  gather, not R model evaluations.
* Newton steps use the Gaussian NLL's Fisher diagonal (1/sigma^2 for the
  mean head, 1/2 for the log-variance head) — constant-hessian leaves, no
  line search.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseModel, register_model

__all__ = ["GBDT"]


class Forest(NamedTuple):
    feats: jnp.ndarray  # (R, T) int32 split feature per level
    bins: jnp.ndarray  # (R, T) int32 split bin threshold per level (go right if code > bin)
    leaf_w: jnp.ndarray  # (R, 2**T, 2) leaf deltas (mean, log-var heads)


def _gauss_grads(pred: jnp.ndarray, y: jnp.ndarray):
    """Gradients of the Gaussian NLL wrt (mu, s=log var); Fisher hessians."""
    mu, s = pred[:, 0], jnp.clip(pred[:, 1], -10.0, 10.0)
    inv_var = jnp.exp(-s)
    r = mu - y
    g_mu = r * inv_var
    g_s = 0.5 * (1.0 - r * r * inv_var)
    h_mu = inv_var
    h_s = jnp.full_like(s, 0.5)
    return jnp.stack([g_mu, g_s], 1), jnp.stack([h_mu, h_s], 1)


@partial(jax.jit, static_argnames=("n_rounds", "depth", "n_bins", "lr", "lam", "subsample"))
def _fit_forest(
    key: jax.Array,
    codes: jnp.ndarray,  # (N, F) int32 bin codes
    y: jnp.ndarray,  # (N,) standardized targets
    mask: jnp.ndarray,  # (N,) bool valid rows
    n_rounds: int,
    depth: int,
    n_bins: int,
    lr: float = 0.2,
    lam: float = 1.0,
    subsample: float = 0.8,
) -> Forest:
    N, F = codes.shape
    L = 2**depth
    m = mask.astype(jnp.float32)
    code_oh = jax.nn.one_hot(codes, n_bins, dtype=jnp.float32)  # (N, F, B)

    def build_tree(pred, kr):
        # stochastic gradient boosting: per-round row subsampling is the
        # randomization that makes virtual ensembles diverse (the reference
        # relies on catboost's posterior_sampling/SGLB for this,
        # catboost.py:26,37) — without it knowledge uncertainty collapses
        # and LCB re-suggests the incumbent's bin forever.
        kr, kn = jax.random.split(kr)
        bag = jax.random.bernoulli(kr, subsample, (N,)).astype(jnp.float32)
        g, h = _gauss_grads(pred, y)
        g = g * (m * bag)[:, None]
        h = h * (m * bag)[:, None]
        # combined split score uses both heads' Newton gain
        leaf0 = jnp.zeros((N,), jnp.int32)

        def level(carry, t):
            leaf, feats, bins = carry
            leaf_oh = jax.nn.one_hot(leaf, L, dtype=jnp.float32)  # (N, L)
            # histograms: (L, F, B) for each head
            Gm = jnp.einsum("nl,nfb,n->lfb", leaf_oh, code_oh, g[:, 0])
            Gs = jnp.einsum("nl,nfb,n->lfb", leaf_oh, code_oh, g[:, 1])
            Hm = jnp.einsum("nl,nfb,n->lfb", leaf_oh, code_oh, h[:, 0])
            Hs = jnp.einsum("nl,nfb,n->lfb", leaf_oh, code_oh, h[:, 1])
            GmL = jnp.cumsum(Gm, -1)
            GsL = jnp.cumsum(Gs, -1)
            HmL = jnp.cumsum(Hm, -1)
            HsL = jnp.cumsum(Hs, -1)
            GmT, GsT = GmL[..., -1:], GsL[..., -1:]
            HmT, HsT = HmL[..., -1:], HsL[..., -1:]

            def gain(GL, HL, GT, HT):
                GR, HR = GT - GL, HT - HL
                return GL**2 / (HL + lam) + GR**2 / (HR + lam)

            score = gain(GmL, HmL, GmT, HmT) + gain(GsL, HsL, GsT, HsT)
            score = jnp.sum(score, axis=0)  # (F, B) summed over leaves
            # last bin = degenerate split (everything left); forbid it
            score = score.at[:, -1].set(-jnp.inf)
            flat = jnp.argmax(score)
            f_star = (flat // n_bins).astype(jnp.int32)
            b_star = (flat % n_bins).astype(jnp.int32)
            go_right = (codes[:, f_star] > b_star).astype(jnp.int32)
            leaf = leaf * 2 + go_right
            return (leaf, feats.at[t].set(f_star), bins.at[t].set(b_star)), None

        (leaf, feats, bins), _ = jax.lax.scan(
            level,
            (leaf0, jnp.zeros((depth,), jnp.int32), jnp.zeros((depth,), jnp.int32)),
            jnp.arange(depth),
        )
        # Newton leaf values per head + Langevin leaf noise (SGLB — the
        # mechanism behind catboost's posterior_sampling=True, catboost.py:26):
        # noise sd ~ 1/sqrt(H_leaf + lam), so sparse leaves keep jittering at
        # stationarity and truncated sub-ensembles behave like posterior
        # samples whose disagreement grows away from data.
        leaf_oh = jax.nn.one_hot(leaf, L, dtype=jnp.float32)
        Gl = leaf_oh.T @ g  # (L, 2)
        Hl = leaf_oh.T @ h
        eps = jax.random.normal(kn, Gl.shape)
        w = -Gl / (Hl + lam) + math.sqrt(lr) * eps / jnp.sqrt(Hl + lam)
        return feats, bins, w, leaf

    def round_step(pred, kr):
        feats, bins, w, leaf = build_tree(pred, kr)
        delta = lr * w[leaf]  # (N, 2)
        return pred + delta, (feats, bins, lr * w)

    pred0 = jnp.zeros((N, 2), jnp.float32)
    _, (feats, bins, leaf_w) = jax.lax.scan(
        round_step, pred0, jax.random.split(key, n_rounds)
    )
    return Forest(feats=feats, bins=bins, leaf_w=leaf_w)


@partial(jax.jit, static_argnames=("n_virtual",))
def _predict_forest(forest: Forest, codes: jnp.ndarray, n_virtual: int):
    """Staged predictions -> (mean, total variance) in standardized frame.

    Virtual ensembles (catboost.py:55-58 semantics): truncate the boosted
    sequence at k evenly spaced stages over the SECOND half of rounds;
    knowledge uncertainty = variance of the mean head across truncations,
    data uncertainty = mean of exp(log-var head).
    """
    R, T = forest.feats.shape
    P = codes.shape[0]
    # leaf index per (point, round): gather codes at split features
    c = codes[:, forest.feats.reshape(-1)].reshape(P, R, T)
    bits = (c > forest.bins[None]).astype(jnp.int32)  # (P, R, T)
    pows = 2 ** jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    leaf = jnp.sum(bits * pows[None, None, :], -1)  # (P, R)
    contrib = jnp.take_along_axis(
        forest.leaf_w[None], leaf[:, :, None, None], axis=2
    )[:, :, 0, :]  # (P, R, 2)
    staged = jnp.cumsum(contrib, axis=1)  # (P, R, 2)
    ks = jnp.clip(
        (R // 2) + ((jnp.arange(n_virtual) + 1) * (R - R // 2)) // n_virtual - 1,
        0,
        R - 1,
    )
    sub = staged[:, ks]  # (P, K, 2)
    # averaging sub-ensemble means integrates out the Langevin leaf noise
    mu = jnp.mean(sub[:, :, 0], axis=1)
    knowledge = jnp.var(sub[:, :, 0], axis=1)
    data = jnp.mean(jnp.exp(jnp.clip(sub[:, :, 1], -10.0, 10.0)), axis=1)
    return mu, knowledge + data


@register_model("gbdt")
@register_model("catboost")
class GBDT(BaseModel):
    """Oblivious-tree gradient boosting with RMSEWithUncertainty semantics."""

    support_ts = False
    support_grad = False
    support_warm_start = False

    def __init__(self, space, num_out: int = 1, **conf):
        super().__init__(space, num_out=num_out, **conf)
        assert num_out == 1, "GBDT is single-output; use multi_task wrapper"
        self.n_rounds = int(conf.get("num_epochs", 100))
        self.num_ensembles = int(conf.get("num_ensembles", 10))
        if self.n_rounds < 2 * self.num_ensembles:
            # reference guard: iterations >= 2 * num_ensembles (catboost.py:29-30)
            self.n_rounds = 2 * self.num_ensembles
        self.lr = float(conf.get("lr", 0.2))
        # reference default depth is 10 (1024 leaves) — tuned for big data;
        # BO fits hundreds of points, so the TPU default is shallower
        self.depth = int(conf.get("depth", 4))
        self.n_bins = int(conf.get("n_bins", 32))
        self.lam = float(conf.get("lam", 1.0))
        self._edges: Optional[np.ndarray] = None
        self.forest: Optional[Forest] = None

    # ------------------------------------------------------- host binning
    def _feature_spec(self):
        """Expanded feature list: numeric cols pass through (quantile bins);
        categorical cols one-hot into per-category binary features."""
        spec = []
        for d in range(self.space.num_cols):
            if d in self.space.cat_dims:
                for c in range(int(self.space.num_categories[d])):
                    spec.append(("cat", d, c))
            else:
                spec.append(("num", d, -1))
        return spec

    def _bin_fit(self, X: np.ndarray):
        spec = self._feature_spec()
        edges = []
        for kind, d, _c in spec:
            if kind == "num":
                qs = np.quantile(X[:, d], np.linspace(0, 1, self.n_bins + 1)[1:-1])
                edges.append(np.unique(qs).astype(np.float32))
            else:
                edges.append(np.asarray([0.5], np.float32))
        self._edges = edges

    def _bin_apply(self, X: np.ndarray) -> np.ndarray:
        spec = self._feature_spec()
        cols = []
        for (kind, d, c), e in zip(spec, self._edges):
            v = (X[:, d] == c).astype(np.float32) if kind == "cat" else X[:, d]
            cols.append(np.searchsorted(e, v, side="right"))
        return np.stack(cols, 1).astype(np.int32)

    def _device_binning(self):
        """Static index arrays + padded edge matrix for in-graph binning."""
        spec = self._feature_spec()
        src = np.asarray([d for _k, d, _c in spec], np.int32)
        is_cat = np.asarray([k == "cat" for k, _d, _c in spec], bool)
        cat_val = np.asarray([max(c, 0) for _k, _d, c in spec], np.float32)
        E = max(len(e) for e in self._edges)
        edges = np.full((len(spec), E), np.inf, np.float32)
        for i, e in enumerate(self._edges):
            edges[i, : len(e)] = e
        return jnp.asarray(src), jnp.asarray(is_cat), jnp.asarray(cat_val), jnp.asarray(edges)

    def _bin_apply_jnp(self, Xs, src, is_cat, cat_val, edges):
        """Jittable binning: (P, D) opt-frame -> (P, F) int32 codes.

        Matches np.searchsorted(e, v, side='right') = sum(v >= e)."""
        v_raw = Xs[:, src]  # (P, F)
        v = jnp.where(is_cat[None, :], (v_raw == cat_val[None, :]).astype(Xs.dtype), v_raw)
        return jnp.sum(v[:, :, None] >= edges[None, :, :], axis=-1).astype(jnp.int32)

    # --------------------------------------------------------------- api
    def fit(self, X, y):
        from ..utils.dtypes import pad_bucket

        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32).reshape(len(X), -1)[:, 0]
        ok = np.isfinite(y) & np.all(np.isfinite(X), axis=1)
        X, y = X[ok], y[ok]
        self._y_mean = float(np.mean(y)) if len(y) else 0.0
        ystd = float(np.std(y)) if len(y) else 1.0
        self._y_std = ystd if ystd > 1e-8 else 1.0
        self._bin_fit(X)
        codes = self._bin_apply(X)
        n_pad = pad_bucket(max(len(X), 2))
        cp = np.zeros((n_pad, codes.shape[1]), np.int32)
        yp = np.zeros((n_pad,), np.float32)
        mk = np.zeros((n_pad,), bool)
        cp[: len(X)] = codes
        yp[: len(X)] = (y - self._y_mean) / self._y_std
        mk[: len(X)] = True
        seed = int(self.conf.get("random_seed", 42)) + len(X)
        self.forest = _fit_forest(
            jax.random.PRNGKey(seed),
            jnp.asarray(cp),
            jnp.asarray(yp),
            jnp.asarray(mk),
            n_rounds=self.n_rounds,
            depth=self.depth,
            n_bins=self.n_bins,
            lr=self.lr,
            lam=self.lam,
            subsample=float(self.conf.get("subsample", 0.8)),
        )
        return self

    def predict(self, X):
        assert self.forest is not None, "fit first"
        from ..utils.dtypes import pad_bucket

        X = np.asarray(X, np.float32)
        p = len(X)
        p_pad = pad_bucket(max(p, 2))
        codes = self._bin_apply(X)
        cp = np.zeros((p_pad, codes.shape[1]), np.int32)
        cp[:p] = codes
        mu, var = _predict_forest(self.forest, jnp.asarray(cp), self.num_ensembles)
        mu = np.asarray(mu[:p]).reshape(-1, 1) * self._y_std + self._y_mean
        var = np.asarray(var[:p]).reshape(-1, 1) * self._y_std**2
        return mu, np.maximum(var, 1e-12)

    # --------------------------- pure-state protocol (jit-safe prediction)
    @property
    def state(self):
        assert self.forest is not None, "fit first"
        src, is_cat, cat_val, edges = self._device_binning()
        return (
            self.forest,
            src,
            is_cat,
            cat_val,
            edges,
            jnp.asarray(self._y_mean, jnp.float32),
            jnp.asarray(self._y_std, jnp.float32),
        )

    def predict_pure(self, state, Xs):
        forest, src, is_cat, cat_val, edges, y_mean, y_std = state
        codes = self._bin_apply_jnp(Xs, src, is_cat, cat_val, edges)
        mu, var = _predict_forest(forest, codes, self.num_ensembles)
        mu = mu[:, None] * y_std + y_mean
        var = jnp.maximum(var[:, None], 1e-12) * y_std**2
        return mu, var

    @property
    def noise(self):
        return np.zeros(1)
