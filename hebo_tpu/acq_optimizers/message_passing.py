"""Message-passing acquisition maximizer over a clique tree (RDUCB).

Parity: RDUCB ``MPAcquisitionOptimizer``
(RDUCB/hdbo/acquisition_optimizer.py:21-379: ``optimize`` 78-130, grid
domains ``make_small_domains`` :689, zooming :96-120) and MCBO
``MessagePassingOptimizer``
(MCBO/mcbo/acq_optimizers/message_passing_optimizer.py:46-736:
chordalization, leaf→root max-marginal messages :607-628 + traceback).

The additive acquisition  A(x) = Σ_edges a_ij(x_i, x_j)  (per-clique
AddLCB from the random-decomposition GP) is maximized EXACTLY over a
gridded domain by max-sum dynamic programming on the spanning tree:

  msg_{i→p}(x_p) = max_{x_i} [ a_{ip}(x_i, x_p) + Σ_{c ∈ ch(i)} msg_{c→i}(x_i) ]

Device/host split: the expensive part — per-edge (g × g) acquisition
tables, each a posterior evaluation of g² candidates against the N-point
training set — runs as batched jitted GP programs; the DP itself is O(D·g²)
numpy on tables of a few KB.  Continuous dims are refined by zooming:
re-grid around the incumbent with a shrunken span and re-run.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .mcbo_opts import AcqOptimizerBase

__all__ = ["MessagePassingOptimizer"]


class MessagePassingOptimizer(AcqOptimizerBase):
    def __init__(self, space, grid_size: int = 16, n_zoom: int = 2,
                 kappa: float = 2.0, **kw):
        super().__init__(space, **kw)
        self.grid_size = grid_size
        self.n_zoom = n_zoom
        self.kappa = kappa

    # ------------------------------------------------------------ domains
    def _grids(self, lb, ub, center=None, shrink=1.0):
        """Per-dim value grids (lists of arrays, len ≤ grid_size)."""
        g = self.grid_size
        grids = []
        for d in range(self.space.num_cols):
            if d in self.space.cat_dims:
                grids.append(np.arange(int(self.space.num_categories[d]), dtype=float))
            else:
                lo, hi = lb[d], ub[d]
                if center is not None and shrink < 1.0:
                    span = (hi - lo) * shrink
                    lo = max(lb[d], center[d] - span / 2)
                    hi = min(ub[d], center[d] + span / 2)
                if d in self.space.discrete_numeric_dims:
                    vals = np.unique(np.round(np.linspace(lo, hi, g)))
                else:
                    vals = np.linspace(lo, hi, g)
                grids.append(vals)
        return grids

    # ----------------------------------------------------------- dp solve
    def _solve(self, model, kappa, grids, base_point):
        """One exact max-sum pass; returns (x*, value).

        Cliques are handled by kind: pairwise edges sharing dims form the
        spanning-tree DP (RDUCB message passing); all other cliques
        (singletons, self-edges, learned size-k groups) must be DISJOINT —
        each is maximized independently over its grid mesh, which is exact
        because the additive objective factorizes over a partition."""
        space = self.space
        cliques = [tuple(dict.fromkeys(c)) for c in model.cliques]
        D = space.num_cols

        pair_edges = [(e, c) for e, c in enumerate(cliques) if len(c) == 2]
        solo = [(e, c) for e, c in enumerate(cliques) if len(c) != 2]
        pair_dims = {d for _, c in pair_edges for d in c}
        seen = set(pair_dims)
        for _, c in solo:
            assert not (set(c) & seen), (
                "exact maximization needs tree edges or a disjoint partition; "
                "overlapping general cliques require a GA/interleaved optimizer"
            )
            seen.update(c)

        x_star = base_point.copy()
        total_val = 0.0

        # independent exact max per disjoint clique (learned decompositions)
        for e_idx, dims in solo:
            meshes = np.meshgrid(*[grids[d] for d in dims], indexing="ij")
            P = meshes[0].size
            Xq = np.repeat(base_point[None, :], P, axis=0)
            for k, d in enumerate(dims):
                Xq[:, d] = meshes[k].ravel()
            mu, var = model.predict_clique(Xq, e_idx)
            lcb = mu[:, 0] - kappa * np.sqrt(var[:, 0])
            b = int(np.argmin(lcb))
            total_val += float(lcb[b])
            for k, d in enumerate(dims):
                x_star[d] = meshes[k].ravel()[b]

        # tree structure: adjacency from pairwise clique edges
        adj = {d: [] for d in range(D)}
        for e_idx, (i, j) in pair_edges:
            adj[i].append((j, e_idx))
            adj[j].append((i, e_idx))

        # per-edge tables a_ij[xi, xj] (LCB, negated → we MINIMIZE acq)
        tables = {}
        for e_idx, (i, j) in pair_edges:
            gi, gj = grids[i], grids[j]
            P = len(gi) * len(gj)
            Xq = np.repeat(base_point[None, :], P, axis=0)
            mesh_i, mesh_j = np.meshgrid(gi, gj, indexing="ij")
            Xq[:, i] = mesh_i.ravel()
            Xq[:, j] = mesh_j.ravel()
            mu, var = model.predict_clique(Xq, e_idx)
            lcb = mu[:, 0] - kappa * np.sqrt(var[:, 0])
            tables[e_idx] = lcb.reshape(len(gi), len(gj))

        # handle forests/components: roots = first node of each component
        visited = set()
        for root in range(D):
            if root in visited or not adj[root]:
                continue
            # iterative post-order
            order = []
            stack = [(root, -1)]
            comp = []
            while stack:
                node, parent = stack.pop()
                if node in visited:
                    continue
                visited.add(node)
                comp.append(node)
                order.append((node, parent))
                for nb, e in adj[node]:
                    if nb != parent and nb not in visited:
                        stack.append((nb, node))
            # messages leaf→root (reverse of discovery order)
            msg = {d: np.zeros(len(grids[d])) for d in comp}
            argmax_tab = {}
            for node, parent in reversed(order):
                if parent < 0:
                    continue
                e_idx = next(e for nb, e in adj[node] if nb == parent)
                i, j = cliques[e_idx]
                T = tables[e_idx]  # [gi, gj]
                if i == node:
                    score = T + msg[node][:, None]  # over x_node rows
                    best = np.min(score, axis=0)
                    argm = np.argmin(score, axis=0)
                else:
                    score = T + msg[node][None, :]
                    best = np.min(score, axis=1)
                    argm = np.argmin(score, axis=1)
                msg[parent] = msg[parent] + best
                argmax_tab[(node, parent)] = argm
            # root decision + traceback
            r_best = int(np.argmin(msg[root]))
            total_val += float(msg[root][r_best])
            choice = {root: r_best}
            for node, parent in order:
                if parent < 0:
                    continue
                choice[node] = int(argmax_tab[(node, parent)][choice[parent]])
            for d in comp:
                x_star[d] = grids[d][choice[d]]
        return self.space.round_opt(x_star), total_val

    # ---------------------------------------------------------------- api
    def optimize(self, model, acq, acq_params, n_suggestions=1, x_observed=None,
                 tr_manager=None, seed=0):
        assert hasattr(model, "predict_clique"), (
            "MessagePassingOptimizer needs a decomposition model (gp_rd)"
        )
        # validity (tree edges and/or a disjoint partition) is checked in
        # _solve; learned decompositions (decomposition="learn") and
        # nonoverlap partitions are handled exactly via per-clique maxima.
        tr = self._tr(tr_manager)
        lb, ub = tr.numeric_bounds()
        kappa = float(acq_params.kappa)
        base = (
            tr.center.copy()
            if tr.center is not None
            else self.space.sobol_sample_opt(1, seed=seed)[0]
        )
        grids = self._grids(lb, ub)
        x, val = self._solve(model, kappa, grids, base)
        shrink = 1.0
        for _ in range(self.n_zoom):  # zooming refinement (:96-120)
            shrink *= 0.3
            grids = self._grids(lb, ub, center=x, shrink=shrink)
            x2, v2 = self._solve(model, kappa, grids, x)
            if v2 < val:
                x, val = x2, v2
        out = [x]
        # extra batch suggestions: perturbed re-solves with jittered grids
        rng = np.random.default_rng(seed)
        while len(out) < n_suggestions:
            g2 = self._grids(lb, ub, center=None)
            g2 = [
                v + (rng.random() - 0.5) * (v[1] - v[0]) if len(v) > 1 and d not in self.space.cat_dims else v
                for d, v in enumerate(g2)
            ]
            g2 = [np.clip(v, lb[d], ub[d]) for d, v in enumerate(g2)]
            xi, _ = self._solve(model, kappa, g2, base)
            out.append(xi)
        return np.stack(out[:n_suggestions])
