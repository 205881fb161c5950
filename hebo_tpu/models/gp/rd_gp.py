"""Random-decomposition additive GP (RDUCB / MCBO RandDecompositionGP).

Parity targets:
  * RDUCB random-tree decomposition: a fresh random tree over dimensions
    is sampled every ``learnDependencyStructureRate`` iterations and the
    additive kernel follows its edges (RDUCB/hdbo/algorithms.py:398-431,
    graph sampling via disjoint-set ``get_random_graph`` — mirrored by
    HEBO models/util.py:get_random_graph and gp_util.default_kern_rd),
  * MCBO ``RandDecompositionGP`` (models/gp/rand_decomposition_gp.py:
    24-378): additive GP over cliques with per-clique posteriors consumed
    by the message-passing acquisition optimizer and ``AddLCB``.

Kernel: K(x, x') = Σ_c  σ_c² · Π_{d ∈ clique c} k_d(x_d, x'_d), cliques =
edges of a random spanning tree (plus singletons for isolated dims when
D = 1).  Per-dim kernels: Matérn on scaled numerics, exp-agreement on
categoricals.  The sum over cliques is one stacked einsum — cliques are a
leading tensor axis, not a python loop over GPy kernel objects.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.chol import chol_solve, safe_cholesky
from ..base import BaseModel, register_model
from .gp import GP, GPCache, GPCore, GPData, GPParams

__all__ = ["random_tree", "graph_overlap_cliques", "graph_nonoverlap_cliques", "RDGPCore", "RDGP"]


def graph_overlap_cliques(
    D: int, rng: np.random.Generator, clique_size: int = 3, n_cliques: int = 0
) -> List[Tuple[int, ...]]:
    """Random OVERLAPPING clique cover: cliques share dimensions.

    Parity: RDUCB hypothesis-space sampler ``GraphOverlap``
    (RDUCB/hdbo/function_optimizer.py:62-1032 family)."""
    n_cliques = n_cliques or max(1, D // max(clique_size - 1, 1))
    cliques, covered = [], set()
    while len(cliques) < n_cliques or len(covered) < D:
        c = tuple(sorted(rng.choice(D, size=min(clique_size, D), replace=False)))
        cliques.append(c)
        covered.update(c)
        if len(cliques) > 4 * n_cliques:
            break
    for d in range(D):  # ensure full coverage
        if d not in covered:
            cliques.append((d,))
    return cliques


def graph_nonoverlap_cliques(
    D: int, rng: np.random.Generator, clique_size: int = 3
) -> List[Tuple[int, ...]]:
    """Random PARTITION into disjoint cliques (``GraphNonOverlap``)."""
    perm = list(rng.permutation(D))
    out = []
    while perm:
        out.append(tuple(sorted(perm[:clique_size])))
        perm = perm[clique_size:]
    return out


def random_tree(D: int, rng: np.random.Generator) -> List[Tuple[int, int]]:
    """Uniform-ish random spanning tree via random-order union (the
    disjoint-set construction of the reference's get_random_graph)."""
    if D == 1:
        return [(0, 0)]
    nodes = list(rng.permutation(D))
    edges = []
    connected = [nodes[0]]
    for v in nodes[1:]:
        u = connected[rng.integers(len(connected))]
        edges.append((min(u, v), max(u, v)))
        connected.append(v)
    return edges


class RDGPCore(GPCore):
    """Additive-over-cliques GP core.  ``cliques``: tuple of (d1, d2) dim
    pairs (opt-frame column indices)."""

    def __init__(self, *args, cliques: Tuple[Tuple[int, int], ...] = (), **kw):
        super().__init__(*args, **kw)
        self.cliques = tuple(tuple(c) for c in cliques)
        self.n_cliques = len(self.cliques)
        # log_ls: per-dim lengthscale (D dims used by cliques) packed first,
        # then per-clique log outputscales
        self.d_feat = self.d_num + len(self.cat_dims) + self.n_cliques

    def _dim_kernel(self, params: GPParams, x1d, x2d, d: int, ls):
        """1-D kernel between column vectors for opt-frame dim d."""
        if d in self.cat_dims:
            agree = (x1d[:, None] == x2d[None, :]).astype(jnp.float32)
            theta = jnp.exp(ls)
            return jnp.exp(theta * (agree - 1.0))
        # numeric: scaled Matérn-5/2
        diff = jnp.abs(x1d[:, None] - x2d[None, :]) / jnp.exp(ls)
        s = math.sqrt(5.0) * diff
        return (1.0 + s + 5.0 * diff**2 / 3.0) * jnp.exp(-s)

    def _dim_ls_index(self, d: int) -> int:
        if d in self.cat_dims:
            return self.d_num + self.cat_dims.index(d)
        return self.numeric_dims.index(d)

    def _scale_col(self, X, d, data: GPData):
        if d in self.cat_dims:
            return X[:, d]
        j = self.numeric_dims.index(d)
        return (X[:, d] - data.x_lb[j]) / data.x_span[j]

    def clique_gram(
        self, params: GPParams, X1, X2, data: GPData, c: int
    ) -> jnp.ndarray:
        """σ_c² Π_d k_d — one clique's Gram block."""
        dims = self.cliques[c]
        sc = jnp.exp(params.log_ls[self.d_num + len(self.cat_dims) + c])
        K = None
        for d in set(dims):
            ls = params.log_ls[self._dim_ls_index(d)]
            x1d = self._scale_col(X1, d, data)
            x2d = self._scale_col(X2, d, data)
            Kd = self._dim_kernel(params, x1d, x2d, d, ls)
            K = Kd if K is None else K * Kd
        return sc * K

    def gram_points(self, params, X1, X2, data):
        K = None
        for c in range(self.n_cliques):
            Kc = self.clique_gram(params, X1, X2, data, c)
            K = Kc if K is None else K + Kc
        return K

    def prior_diag(self, params):
        return jnp.sum(
            jnp.exp(params.log_ls[self.d_num + len(self.cat_dims) :])
        )

    def init_params(self, key, data):
        ke, kl = jax.random.split(key)
        p0 = GPParams(
            log_ls=jnp.zeros((self.d_feat,), jnp.float32)
            + 0.1 * jax.random.normal(kl, (self.d_feat,), jnp.float32),
            log_sc=jnp.asarray(0.0, jnp.float32),
            log_noise=jnp.asarray(math.log(1e-2), jnp.float32),
            mean=jnp.asarray(0.0, jnp.float32),
            emb=jnp.zeros((0, 0), jnp.float32),
            log_wa=jnp.zeros((self.d_num,), jnp.float32),
            log_wb=jnp.zeros((self.d_num,), jnp.float32),
        )
        # init per-clique scales to 1/n_cliques so total variance ~ 1
        scales = jnp.full(
            (self.n_cliques,), -jnp.log(jnp.asarray(float(max(self.n_cliques, 1)))),
        )
        log_ls = p0.log_ls.at[self.d_num + len(self.cat_dims) :].set(scales)
        return p0._replace(log_ls=log_ls)

    # per-clique posterior (the message-passing optimizer's interface)
    def predict_clique(
        self, params, cache: GPCache, data: GPData, Xs, c: int
    ):
        """Posterior (mu_c, var_c) of the c-th additive component at Xs
        (standardized-y frame)."""
        Ks = self.clique_gram(params, data.X, Xs, data, c)
        m = data.mask.astype(Ks.dtype)
        Ks = Ks * m[:, None]
        mu = Ks.T @ cache.alpha  # component mean (no constant mean term)
        v = jax.scipy.linalg.solve_triangular(cache.L, Ks, lower=True)
        sc = jnp.exp(params.log_ls[self.d_num + len(self.cat_dims) + c])
        var = jnp.maximum(sc - jnp.sum(v * v, axis=0), 1e-10)[:, None]
        mu = jnp.where(cache.ok, mu, jnp.zeros_like(mu))
        var = jnp.where(cache.ok, var, jnp.ones_like(var))
        return mu, var


@register_model("gp_rd")
class RDGP(GP):
    """Random-decomposition GP with resampling of the decomposition.

    ``resample_decomposition()`` draws a fresh random tree (the RDUCB
    "no structure learning, fresh random tree each relearn" policy,
    algorithms.py:398-431).  With ``decomposition="learn"`` it instead
    marks the structure stale; the next ``fit`` runs the Gibbs structure
    learner (models/gp/structure.py — RDUCB ``learnDependencyStructure``
    parity, function_optimizer.py:630-712) on the training data."""

    def __init__(self, space, num_out: int = 1, **conf):
        super().__init__(space, num_out=num_out, **conf)
        self._conf = conf
        self._decomp_seed = conf.get("decomposition_seed", 0)
        self._learn_pending = False
        self.resample_decomposition()

    def resample_decomposition(self):
        space = self.space
        rng = np.random.default_rng(self._decomp_seed)
        self._decomp_seed += 1
        D = space.num_cols
        strategy = self._conf.get("decomposition", "tree")
        if strategy in ("tree", "learn"):
            # "learn" starts from a random tree; the learner replaces it at
            # the next fit (and at every resample_decomposition call after).
            self.cliques = random_tree(D, rng)
            if strategy == "learn":
                self._learn_pending = True
        elif strategy == "overlap":
            self.cliques = graph_overlap_cliques(
                D, rng, clique_size=self._conf.get("clique_size", 3)
            )
        elif strategy == "nonoverlap":
            self.cliques = graph_nonoverlap_cliques(
                D, rng, clique_size=self._conf.get("clique_size", 3)
            )
        else:
            raise ValueError(f"unknown decomposition {strategy!r}")
        self._rebuild_core()

    def _rebuild_core(self):
        space = self.space
        conf = self._conf
        num_cats = [int(space.num_categories[c]) for c in space.cat_dims]
        self.core = RDGPCore(
            numeric_dims=tuple(space.numeric_dims) + tuple(space.perm_dims),
            cat_dims=tuple(space.cat_dims),
            num_categories=tuple(num_cats),
            optimizer=conf.get("optimizer", "adam"),
            n_steps=conf.get("num_epochs", 100),
            lr=conf.get("lr", 0.05),
            n_ensemble=conf.get("n_ensemble", 1),
            cliques=tuple(self.cliques),
        )
        self._fit_jit = {}
        self._pred_jit = {}
        self._clique_pred_jit = {}

    # --------------------------------------- learned structure (device Gibbs)
    def learn_decomposition(self, X: np.ndarray, y: np.ndarray):
        """Run the Gibbs assignment learner on (opt-frame X, y) and adopt
        the best-likelihood decomposition."""
        from ...utils.dtypes import pad_bucket
        from .gp import _make_data
        from .structure import assignment_to_cliques, learn_assignment

        n_pad = pad_bucket(max(len(X), 2))
        data = _make_data(X, y, self.core.numeric_dims, n_pad)
        D = self.space.num_cols
        mgs = int(self._conf.get("max_group_size", 3))
        # M must exceed ceil(D/max_group_size) or the partition saturates and
        # no single-dim Gibbs move is feasible; default gives 4 slack groups.
        M = int(self._conf.get("n_groups", min(D, -(-D // mgs) + 4)))
        key = jax.random.PRNGKey(self._decomp_seed)
        self._decomp_seed += 1
        z, _mll = learn_assignment(
            key,
            data.X,
            data.y,
            data.mask,
            data.x_lb,
            data.x_span,
            numeric_dims=tuple(self.core.numeric_dims),
            cat_dims=tuple(self.core.cat_dims),
            M=M,
            max_group_size=int(self._conf.get("max_group_size", 3)),
            n_sweeps=int(self._conf.get("n_structure_sweeps", 2)),
        )
        self.cliques = assignment_to_cliques(np.asarray(z), M)
        self._rebuild_core()
        self._learn_pending = False

    def fit(self, X, y):
        if self._learn_pending and len(X) >= 3:
            self.learn_decomposition(np.asarray(X), np.asarray(y))
        return super().fit(X, y)

    # ------------------------------------------- clique posterior (device)
    def predict_clique(self, Xs: np.ndarray, c: int):
        """Per-clique posterior at opt-frame candidates, raw-y frame."""
        key = (self.data.X.shape[0], len(Xs) if False else "dyn", c)
        core = self.core
        if c not in self._clique_pred_jit:

            @jax.jit
            def f(samples, caches, data, Xq):
                def one(p, ca):
                    return core.predict_clique(p, ca, data, Xq, c)

                mus, vars_ = jax.vmap(one)(samples, caches)
                mu = jnp.mean(mus, axis=0)
                var = jnp.maximum(
                    jnp.mean(vars_ + mus**2, axis=0) - mu**2, 1e-10
                )
                return mu, var

            self._clique_pred_jit[c] = f
        mu, var = self._clique_pred_jit[c](
            self.samples, self.caches, self.data, jnp.asarray(Xs, jnp.float32)
        )
        ys = float(self.data.y_std)
        return np.asarray(mu) * ys, np.asarray(var) * ys**2
