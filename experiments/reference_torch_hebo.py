"""Reference-equivalent HEBO in plain torch/numpy (CPU) for like-for-like
latency + regret baselines.

gpytorch/pymoo are not installed in this image (and installs are not
permitted), so this is a faithful re-implementation of the reference
pipeline's MATH AND LOOP STRUCTURE — not a port of its code:

  * GP surrogate: ARD Matérn-3/2 over min-max-scaled numerics x learned
    categorical embeddings, constant mean, noise floor — fit by pSGLD for
    100 epochs, one Cholesky of K_nn per epoch with x10 jitter escalation
    on failure (HEBO/hebo/models/gp/gp.py:35-207, models/nn/sgld.py:76-114).
  * MACE acquisition with the log-EI/log-PI asymptotic switch
    (HEBO/hebo/acquisitions/acq.py:131-171).
  * Mixed-variable NSGA-II, pop 100 x 100 generations: SBX + polynomial
    mutation on continuous dims, uniform crossover + random-reset on
    categoricals, nondominated sort + per-front crowding survival (pymoo
    semantics; HEBO/hebo/acq_optimizers/evolution_optimizer.py:26-160).
  * HEBO loop: Sobol init 1+D, power-transformed y, kappa schedule, dedupe
    + elite batch selection (HEBO/hebo/optimizers/hebo.py:31-229).

Like the reference (hebo.py:28) it runs single-threaded torch CPU.
"""

from __future__ import annotations

import math
import time

import numpy as np
import torch

torch.set_num_threads(1)  # reference: HEBO/hebo/optimizers/hebo.py:28


# --------------------------------------------------------------------- GP
class TorchGP:
    """Matérn-3/2 ARD GP with categorical embeddings, pSGLD-fit (CPU)."""

    def __init__(self, d_num, cat_sizes, emb_dim=None, num_epochs=100, lr=0.05):
        self.d_num = d_num
        self.cat_sizes = list(cat_sizes)
        maxc = max(cat_sizes) if cat_sizes else 0
        self.emb_dim = emb_dim or min(50, 1 + maxc // 2)
        self.num_epochs = num_epochs
        self.lr = lr
        self.noise_lb = 8.9e-5

    def _init_params(self, Xn, Xe):
        d_feat = self.d_num + len(self.cat_sizes) * (self.emb_dim if self.cat_sizes else 0)
        g = torch.Generator().manual_seed(0)
        p = {
            "log_ls": torch.zeros(d_feat, requires_grad=True),
            "log_sc": torch.zeros((), requires_grad=True),
            "log_noise": torch.tensor(math.log(1e-2), requires_grad=True),
            "mean": torch.zeros((), requires_grad=True),
        }
        self.embs = [
            torch.randn(c, self.emb_dim, generator=g, requires_grad=True)
            for c in self.cat_sizes
        ]
        # median-pairwise-distance lengthscale init (gp_util.py:48-52)
        with torch.no_grad():
            F = self._features(p, Xn, Xe)
            if len(F) > 1:
                d2 = torch.cdist(F, F)
                med = torch.median(d2[d2 > 0]) if (d2 > 0).any() else torch.tensor(1.0)
                p["log_ls"].fill_(torch.log(med.clamp_min(1e-3)))
        return p

    def _features(self, p, Xn, Xe):
        parts = []
        if self.d_num:
            parts.append(Xn)
        for j, emb in enumerate(self.embs):
            parts.append(emb[Xe[:, j]])
        return torch.cat(parts, dim=1) if parts else Xn

    def _gram(self, p, F1, F2):
        ls = torch.exp(p["log_ls"])
        d = torch.cdist(F1 / ls, F2 / ls)
        sq3 = math.sqrt(3.0)
        return torch.exp(p["log_sc"]) * (1 + sq3 * d) * torch.exp(-sq3 * d)

    def _nll(self, p, Xn, Xe, y):
        F = self._features(p, Xn, Xe)
        K = self._gram(p, F, F)
        n = len(y)
        noise = torch.exp(p["log_noise"]) + self.noise_lb
        Kn = K + noise * torch.eye(n)
        # jitter escalation x10 (reference gp.py:103-126)
        jitter = 1e-6
        for _ in range(8):
            try:
                L = torch.linalg.cholesky(Kn + jitter * torch.eye(n))
                break
            except Exception:
                jitter *= 10.0
        else:
            return torch.tensor(1e6)
        r = (y - p["mean"]).unsqueeze(1)
        alpha = torch.cholesky_solve(r, L)
        nll = 0.5 * (r.T @ alpha).squeeze() + torch.log(torch.diagonal(L)).sum()
        # priors: Gamma(0.5,0.5) outputscale, LogNormal noise (gp.py:87)
        sc = torch.exp(p["log_sc"])
        nll = nll - (-0.5 * torch.log(sc) - 0.5 * sc)
        nll = nll - (-0.5 * ((p["log_noise"] - math.log(1e-2)) / 0.5) ** 2)
        return nll

    def fit(self, Xn, Xe, y):
        Xn = torch.as_tensor(Xn, dtype=torch.float32)
        Xe = torch.as_tensor(Xe, dtype=torch.long)
        y = torch.as_tensor(y, dtype=torch.float32).reshape(-1)
        self._ymean, self._ystd = y.mean(), y.std().clamp_min(1e-8)
        ys = (y - self._ymean) / self._ystd
        if self.d_num:
            self._xmin = Xn.min(0).values
            self._xspan = (Xn.max(0).values - self._xmin).clamp_min(1e-8)
            Xn = 2 * (Xn - self._xmin) / self._xspan - 1
        p = self._init_params(Xn, Xe)
        params = list(p.values()) + self.embs
        # pSGLD (RMSprop-preconditioned Langevin; sgld.py:76-114)
        V = [torch.zeros_like(t) for t in params]
        alpha, lam = 0.99, 1e-5
        g_rng = torch.Generator().manual_seed(1)
        for epoch in range(self.num_epochs):
            nll = self._nll(p, Xn, Xe, ys)
            grads = torch.autograd.grad(nll, params, allow_unused=True)
            with torch.no_grad():
                for t, v, gr in zip(params, V, grads):
                    if gr is None:
                        continue
                    gr = gr.clamp(-10, 10)
                    v.mul_(alpha).addcmul_(gr, gr, value=1 - alpha)
                    G = 1.0 / (lam + v.sqrt())
                    noise = torch.randn(t.shape, generator=g_rng) * (
                        self.lr * G
                    ).clamp_min(0).sqrt()
                    t.add_(-0.5 * self.lr * G * gr + (
                        noise if epoch >= self.num_epochs // 2 else 0.0
                    ))
        # cache posterior
        with torch.no_grad():
            F = self._features(p, Xn, Xe)
            K = self._gram(p, F, F)
            n = len(ys)
            noise = torch.exp(p["log_noise"]) + self.noise_lb
            jitter = 1e-6
            for _ in range(8):
                try:
                    self._L = torch.linalg.cholesky(
                        K + (noise + jitter) * torch.eye(n)
                    )
                    break
                except Exception:
                    jitter *= 10.0
            self._p = p
            self._Xn, self._Xe = Xn, Xe
            r = (ys - p["mean"]).unsqueeze(1)
            self._alpha = torch.cholesky_solve(r, self._L)
        return self

    def predict(self, Xn, Xe):
        with torch.no_grad():
            Xn = torch.as_tensor(Xn, dtype=torch.float32)
            Xe = torch.as_tensor(Xe, dtype=torch.long)
            if self.d_num:
                Xn = 2 * (Xn - self._xmin) / self._xspan - 1
            p = self._p
            Fq = self._features(p, Xn, Xe)
            Ft = self._features(p, self._Xn, self._Xe)
            Ks = self._gram(p, Ft, Fq)
            mu = p["mean"] + Ks.T @ self._alpha
            v = torch.linalg.solve_triangular(self._L, Ks, upper=False)
            var = (torch.exp(p["log_sc"]) - (v * v).sum(0)).clamp_min(1e-10)
            mu = mu.squeeze(1) * self._ystd + self._ymean
            var = var * self._ystd**2
        return mu.numpy(), var.numpy()

    @property
    def noise(self):
        return float(
            (torch.exp(self._p["log_noise"]) + self.noise_lb) * self._ystd**2
        )


# ------------------------------------------------------------------- MACE
def mace_eval(mu, var, tau, kappa, noise_std, rng):
    """(P, 3): LCB, -logEI, -logPI with asymptotic switch (acq.py:131-171)."""
    from scipy.stats import norm

    sigma = np.sqrt(np.maximum(var, 1e-12))
    mu = mu + math.sqrt(2.0) * noise_std * rng.standard_normal(mu.shape)
    lcb = mu - kappa * sigma
    z = (tau - 1e-4 - mu) / sigma
    logphi = norm.logpdf(z)
    direct = np.log(np.maximum(z * norm.cdf(z) + np.exp(logphi), 1e-38))
    asym = logphi - np.log(np.maximum(z * z - 1.0, 1.0))
    lei = np.where(z > -6.0, direct, asym) + np.log(sigma)
    lpi = norm.logcdf(z)
    return np.stack([lcb, -lei, -lpi], axis=1)


# ------------------------------------------------ NSGA-II (pymoo semantics)
def _nd_rank(F):
    P = len(F)
    le = np.all(F[:, None, :] <= F[None, :, :], axis=-1)
    lt = np.any(F[:, None, :] < F[None, :, :], axis=-1)
    D = le & lt
    n_dom = D.sum(0)
    rank = np.full(P, -1)
    cur, r = np.where(n_dom == 0)[0], 0
    assigned = np.zeros(P, bool)
    while len(cur):
        rank[cur] = r
        assigned[cur] = True
        n_dom = n_dom - D[cur].sum(0)
        cur = np.where((n_dom == 0) & ~assigned)[0]
        r += 1
    return rank


def _crowding(F, rank):
    P, M = F.shape
    crowd = np.zeros(P)
    for r in np.unique(rank):
        idx = np.where(rank == r)[0]
        d = np.zeros(len(idx))
        for m in range(M):
            o = np.argsort(F[idx, m], kind="stable")
            f = F[idx][o, m]
            span = max(f[-1] - f[0], 1e-12)
            dm = np.zeros(len(idx))
            dm[o[0]] = dm[o[-1]] = np.inf
            for j in range(1, len(idx) - 1):
                dm[o[j]] = (f[j + 1] - f[j - 1]) / span
            d += dm
        crowd[idx] = d / M
    return crowd


def nsga2(eval_fn, lb, ub, is_cat, pop, gens, X0, rng):
    D = len(lb)
    X = X0.copy()
    F = eval_fn(X)

    def survival(Xa, Fa):
        rank = _nd_rank(Fa)
        crowd = _crowding(Fa, rank)
        order = np.lexsort((-crowd, rank))[:pop]
        return Xa[order], Fa[order]

    for g in range(gens):
        rank = _nd_rank(F)
        crowd = _crowding(F, rank)
        key = rank * 1e9 - np.argsort(np.argsort(-crowd))
        i1, i2 = rng.integers(0, pop, (2, pop))
        win = np.where(key[i1] <= key[i2], i1, i2)
        p1, p2 = X[win], X[np.roll(win, 1)]
        # SBX
        u = rng.random((pop, D))
        beta = np.where(u <= 0.5, (2 * u) ** (1 / 16), (1 / (2 * (1 - u) + 1e-12)) ** (1 / 16))
        swap = rng.random((pop, D)) < 0.5
        child = np.where(swap, 0.5 * ((1 + beta) * p1 + (1 - beta) * p2),
                         0.5 * ((1 - beta) * p1 + (1 + beta) * p2))
        do = rng.random((pop, D)) < 0.9
        child = np.where(do, child, p1)
        child = np.clip(child, lb, ub)  # keep (1-d) bases non-negative below
        # poly mutation
        um = rng.random((pop, D))
        span = ub - lb
        d1 = (child - lb) / (span + 1e-12)
        d2 = (ub - child) / (span + 1e-12)
        lo = (2 * um + (1 - 2 * um) * (1 - d1) ** 21) ** (1 / 21) - 1
        hi = 1 - (2 * (1 - um) + 2 * (um - 0.5) * (1 - d2) ** 21) ** (1 / 21)
        dq = np.where(um <= 0.5, lo, hi)
        mut = rng.random((pop, D)) < 1.0 / D
        child = np.where(mut, child + dq * span, child)
        # categorical path: uniform crossover + reset
        take2 = rng.random((pop, D)) < 0.5
        ck = np.where(take2, p2, p1)
        reset = rng.random((pop, D)) < 1.0 / D
        rand_cat = np.floor(lb + rng.random((pop, D)) * (ub - lb + 1))
        ck = np.where(reset, rand_cat, ck)
        child = np.where(is_cat[None, :], ck, child)
        child = np.clip(child, lb, ub)
        child[:, is_cat] = np.round(child[:, is_cat])
        Fc = eval_fn(child)
        X, F = survival(np.vstack([X, child]), np.vstack([F, Fc]))
    return X, F


# ------------------------------------------------------------ HEBO loop
class TorchHEBO:
    """Reference-pipeline HEBO: suggest/observe over a simple space spec.

    space: list of dicts {name, type: 'num'|'cat', lb, ub | n_cats}.
    """

    def __init__(self, space, pop=100, iters=100, num_epochs=100, seed=0):
        self.space = space
        self.num_dims = [i for i, s in enumerate(space) if s["type"] == "num"]
        self.cat_dims = [i for i, s in enumerate(space) if s["type"] == "cat"]
        self.cat_sizes = [space[i]["n_cats"] for i in self.cat_dims]
        self.lb = np.array(
            [s.get("lb", 0) for s in space], float
        )
        self.ub = np.array(
            [s.get("ub", s.get("n_cats", 1) - 1) for s in space], float
        )
        self.pop, self.iters, self.num_epochs = pop, iters, num_epochs
        self.rng = np.random.default_rng(seed)
        self.X = np.zeros((0, len(space)))
        self.y = np.zeros((0, 1))
        self.rand_sample = 1 + len(space)
        from scipy.stats import qmc

        self._sobol = qmc.Sobol(len(space), scramble=True, seed=seed)

    def _sample(self, n):
        u = self._sobol.random(n)
        X = self.lb + u * (self.ub - self.lb)
        X[:, self.cat_dims] = np.floor(
            self.lb[self.cat_dims]
            + u[:, self.cat_dims] * (self.ub[self.cat_dims] - self.lb[self.cat_dims] + 1)
        )
        return np.clip(X, self.lb, self.ub)

    def suggest(self, n=1):
        if len(self.X) < self.rand_sample:
            return self._sample(n)
        # power transform (hebo.py:127-147)
        from sklearn.preprocessing import PowerTransformer

        yr = self.y[:, 0]
        ok = np.isfinite(yr)
        Xv, yv = self.X[ok], yr[ok]
        try:
            pt = PowerTransformer(
                method="box-cox" if (yv > 0).all() else "yeo-johnson"
            )
            yt = pt.fit_transform(yv.reshape(-1, 1))[:, 0]
            if yt.std() < 0.5:
                pt = PowerTransformer(method="yeo-johnson")
                yt = pt.fit_transform(yv.reshape(-1, 1))[:, 0]
        except Exception:
            yt = yv
        model = TorchGP(len(self.num_dims), self.cat_sizes, num_epochs=self.num_epochs)
        model.fit(Xv[:, self.num_dims], Xv[:, self.cat_dims].astype(int), yt)
        best = np.argmin(yt)
        mu_b, _ = model.predict(
            Xv[best : best + 1, self.num_dims],
            Xv[best : best + 1, self.cat_dims].astype(int),
        )
        tau = float(mu_b[0])
        t = max(1, len(self.X) // n)
        D = len(self.space)
        kappa = math.sqrt(
            2.0 * 0.5 * ((2.0 + D / 2.0) * math.log(t) + math.log(3 * math.pi**2 / 0.03))
        )
        noise_std = math.sqrt(max(model.noise, 0.0))
        rng = self.rng

        def eval_fn(X):
            mu, var = model.predict(
                X[:, self.num_dims], X[:, self.cat_dims].astype(int)
            )
            return mace_eval(mu, var, tau, kappa, noise_std, rng)

        is_cat = np.zeros(D, bool)
        is_cat[self.cat_dims] = True
        X0 = self._sample(self.pop)
        X0[0] = Xv[best]
        pop_X, pop_F = nsga2(
            eval_fn, self.lb, self.ub, is_cat, self.pop, self.iters, X0, rng
        )
        # dedupe + elite batch selection (hebo.py:166-193)
        hist = {tuple(np.round(r, 6)) for r in self.X}
        fresh = [i for i, r in enumerate(pop_X) if tuple(np.round(r, 6)) not in hist]
        if len(fresh) >= n:
            mu, var = model.predict(
                pop_X[:, self.num_dims], pop_X[:, self.cat_dims].astype(int)
            )
            pick = list(rng.choice(fresh, n, replace=False))
            pick[0] = fresh[int(np.argmax(var[fresh]))]
            if n > 1:
                pick[1] = fresh[int(np.argmin(mu[fresh]))]
            return pop_X[pick]
        out = pop_X[fresh]
        return np.vstack([out, self._sample(n - len(out))])

    def observe(self, X, y):
        self.X = np.vstack([self.X, X])
        self.y = np.vstack([self.y, np.asarray(y).reshape(-1, 1)])

    @property
    def best_y(self):
        v = self.y[np.isfinite(self.y[:, 0]), 0]
        return float(v.min()) if len(v) else math.inf


# ----------------------------------------------------------------- tasks
def ackley(X):
    X = np.asarray(X, float)
    a, b, c = 20.0, 0.2, 2 * np.pi
    return (
        -a * np.exp(-b * np.sqrt((X**2).mean(1)))
        - np.exp(np.cos(c * X).mean(1)) + a + np.e
    )[:, None]


def antigen_energy(X, seed=0):
    """Deterministic synthetic 11-mer 20-way binding-energy surface (same
    shape as the AntBO CDRH3 space; the real Absolut! binary is external)."""
    rng = np.random.default_rng(seed)
    W1 = rng.standard_normal((11, 20))
    W2 = rng.standard_normal((10, 20, 20)) * 0.3
    X = np.asarray(X, int)
    e = W1[np.arange(11)[None, :], X].sum(1)
    for j in range(10):
        e = e + W2[j, X[:, j], X[:, j + 1]]
    return e[:, None]


def make_space_ackley(d=6):
    return [{"name": f"x{i}", "type": "num", "lb": -5.0, "ub": 5.0} for i in range(d)]


def make_space_antigen(l=11, n=20):
    return [{"name": f"p{i}", "type": "cat", "n_cats": n} for i in range(l)]


def time_suggests(opt, task, n_iters=6, batch=8, n_seed=20):
    Xs = opt._sample(n_seed)
    opt.observe(Xs, task(Xs))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        rec = opt.suggest(batch)
        times.append(time.perf_counter() - t0)
        opt.observe(rec, task(rec))
    return float(np.mean(times)), float(np.std(times))


if __name__ == "__main__":
    import json, os, sys

    out = {}
    for name, space_fn, task in (
        ("ackley6_b8", make_space_ackley, ackley),
        ("antigen11_b8", make_space_antigen, antigen_energy),
    ):
        opt = TorchHEBO(space_fn(), seed=0)
        mean_s, std_s = time_suggests(opt, task)
        out[name] = {"suggest_s_mean": round(mean_s, 4),
                     "suggest_s_std": round(std_s, 4),
                     "best_y": round(opt.best_y, 4)}
        print(name, out[name], flush=True)
    path = os.path.join(os.path.dirname(__file__), "reference_torch_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
