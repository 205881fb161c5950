"""HEBO — the flagship optimizer (NeurIPS-2020 BBO winner pipeline).

Parity: reference ``HEBO`` (HEBO/hebo/optimizers/hebo.py:31-229):
  * Sobol random-init phase of ``1 + D`` points (:63-75),
  * power-transformed objective (box-cox / yeo-johnson with retry and raw
    fallback, :127-147),
  * GP surrogate (pSGLD-fit Matérn + categorical embeddings),
  * LCB κ schedule  sqrt(2·ν·((2 + D/2)·ln t + ln(3π²/(3δ)))) (:156-160),
  * MACE 3-objective acquisition optimized by NSGA-II (pop 100, 100 gens),
  * dedupe vs history + random top-up (:166-180),
  * batch selection: random picks overridden by best-σ and best-μ elites
    (:182-193).

TPU-native: the model fit and the full NSGA-II acquisition loop are two
jitted device programs (one per padding bucket), re-used without retracing
as the dataset grows; the host rim only does frame conversion, power
transform (µs-scale sklearn-on-scalars) and dedupe bookkeeping.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..acquisitions.acq import MACE, AcqParams
from ..acq_optimizers.evolution import EvolutionOpt
from ..models import get_model
from ..ops.transforms import fit_power_transform, power_transform_y
from .base import AbstractOptimizer

__all__ = ["HEBO"]


class HEBO(AbstractOptimizer):
    support_parallel_opt = True
    support_combinatorial = True
    support_contextual = True

    def __init__(
        self,
        space,
        model_name: str = "gp",
        rand_sample: Optional[int] = None,
        acq_cls=MACE,
        es: str = "nsga2",
        model_config: Optional[dict] = None,
        csv_save_path: Optional[str] = None,
        scramble_seed: int = 0,
        pop: int = 100,
        iters: int = 100,
        mesh=None,
        migrate_every: int = 10,
    ):
        super().__init__(space, csv_save_path)
        self.model_name = model_name
        self.rand_sample = (
            rand_sample if rand_sample is not None else 1 + space.num_cols
        )
        self.acq_cls = acq_cls
        # default fit schedule: 2 vmapped restarts × 50 pSGLD steps beats
        # 1 × 100 on both wall-clock (fewer sequential Cholesky steps) and
        # regret (restart diversity) — experiments/bench_variants.py
        defaults = {"num_epochs": 50, "n_restarts": 2} if model_name == "gp" else {}
        self.model_config = {**defaults, **(model_config or {})}
        self.scramble_seed = scramble_seed
        self.pop = pop
        self.iters = iters
        # multi-chip SPMD suggest (jax.sharding.Mesh, 1-D): GP restarts run
        # per-device (global best via pmin/psum) and the NSGA-II population
        # is sharded into islands with all_gather elite migration
        # (parallel/sharded.make_fused_suggest_sharded)
        self.mesh = mesh
        self.migrate_every = migrate_every
        self._sobol_count = 0
        self.model = None
        self._evo = None
        self._fused = {}  # bucket → jitted fit+evolve program (GP fast path)

    # -------------------------------------------------------------- suggest
    def quasi_sample(self, n: int, fix_input: Optional[dict] = None) -> pd.DataFrame:
        X = self.space.sobol_sample_opt(
            n, seed=self.scramble_seed + self._sobol_count
        )
        self._sobol_count += 1
        df = self.space.inverse_transform(X)
        if fix_input:
            for k, v in fix_input.items():
                df[k] = v
        return df

    def method_suggest(self, n_suggestions=1, fix_input=None):
        import time

        if self.num_obs < self.rand_sample:
            return self.quasi_sample(n_suggestions, fix_input)

        space = self.space
        X = space.transform(self.X)
        yr = self.y[:, 0].copy()
        valid = np.isfinite(yr) & np.all(np.isfinite(X), axis=1)
        Xv, yv = X[valid], yr[valid]
        if len(Xv) < 2:
            # every observation so far failed (non-finite y): nothing to
            # model — keep exploring quasi-randomly instead of crashing
            return self.quasi_sample(n_suggestions, fix_input)

        # power-transform y (box-cox/yeo-johnson, fallback raw — :127-147)
        pt = fit_power_transform(yv)
        yt = power_transform_y(yv, pt).reshape(-1, 1)

        if self.model is None:
            self.model = get_model(self.model_name, space, num_out=1, **self.model_config)
        if not hasattr(self, "_acq"):
            self._acq = self.acq_cls() if isinstance(self.acq_cls, type) else self.acq_cls
        acq = self._acq

        # κ schedule (:156-160)
        t = max(1, self.num_obs // n_suggestions)
        upsi, delta = 0.5, 0.01
        D = space.num_cols
        kappa = math.sqrt(
            2.0 * upsi * ((2.0 + D / 2.0) * math.log(max(t, 1)) + math.log(3 * math.pi**2 / (3 * delta)))
        )

        from ..utils.dtypes import pad_bucket

        use_fused = (
            type(self.model).__name__ == "GP"
            and getattr(self.model, "inference", "map") == "map"
            # above the dense-factorization cap the generic path handles
            # large N properly (subsampled fit + CG/block-sharded
            # posterior); the fused program would run dense Cholesky at
            # the full bucket every pSGLD step
            and pad_bucket(max(len(Xv), 2))
            <= self.model.core.max_cholesky_size
        )
        if use_fused:
            pop_X, pop_F, mu_pop, var_pop = self._fused_suggest(
                Xv, yt, kappa, fix_input
            )
        else:
            t0 = time.time()
            self.model.fit(Xv, yt)
            self.fit_time.append(time.time() - t0)
            best_id = int(np.argmin(yt[:, 0]))
            py, ps2 = self.model.predict(Xv[best_id : best_id + 1])
            noise_scale = float(np.sqrt(self.model.noise[0]))
            params = AcqParams(
                tau=jnp.float32(float(py[0, 0])),
                kappa=jnp.float32(kappa),
                eps=jnp.float32(1e-4),
                key=jax.random.PRNGKey(self.num_obs),
                noise=jnp.float32(noise_scale),
            )
            t0 = time.time()
            if self._evo is None:
                self._evo = EvolutionOpt(space, acq, pop=self.pop, iters=self.iters)
            self._evo.acq = acq
            pop_X, pop_F = self._evo.optimize(
                model=self.model,
                acq_params=params,
                initial_suggest=Xv[best_id : best_id + 1],
                fix_input=fix_input,
                return_pop=True,
                seed=self.num_obs,
            )
            self.acq_time.append(time.time() - t0)
            mu_pop, var_pop = self.model.predict(pop_X)

        # dedupe vs history + random top-up (:166-180)
        hist = {tuple(np.round(r, 6)) for r in X}
        fresh_idx = [
            i for i, r in enumerate(pop_X) if tuple(np.round(r, 6)) not in hist
        ]
        # unique within the population too
        seen, uniq = set(), []
        for i in fresh_idx:
            k = tuple(np.round(pop_X[i], 6))
            if k not in seen:
                seen.add(k)
                uniq.append(i)
        fresh_idx = uniq

        rng = np.random.default_rng(self.num_obs)
        if len(fresh_idx) >= n_suggestions:
            pick = rng.choice(len(fresh_idx), n_suggestions, replace=False)
            sel = [fresh_idx[i] for i in pick]
            rec = pop_X[sel]
            # elite overrides (:182-193): best-σ explorer + best-μ exploiter
            explore = fresh_idx[int(np.argmax(var_pop[fresh_idx, 0]))]
            exploit = fresh_idx[int(np.argmin(mu_pop[fresh_idx, 0]))]
            rec[0] = pop_X[explore]
            if n_suggestions > 1:
                rec[1] = pop_X[exploit]
        else:
            n_rand = n_suggestions - len(fresh_idx)
            rec = np.vstack(
                [pop_X[fresh_idx].reshape(-1, space.num_cols)]
                + [self.space.sobol_sample_opt(n_rand, seed=int(rng.integers(1 << 30)))]
            )

        df = space.inverse_transform(rec[:n_suggestions])
        if fix_input:
            for k, v in fix_input.items():
                df[k] = v
        return df

    # ----------------------------------------------------- fused fast path
    def _fused_suggest(self, Xv, yt, kappa, fix_input):
        """ONE device program per padding bucket: GP fit (vmapped restarts)
        → posterior caches → incumbent → MACE → NSGA-II → population
        posterior stats.  A single dispatch per BO iteration eliminates the
        host↔device round trips of the generic path (critical through the
        remote-TPU tunnel where each dispatch has fixed latency)."""
        import time

        from ..acq_optimizers.evolution import _space_meta, evolve_raw
        from ..models.gp.gp import _make_data
        from ..utils.dtypes import pad_bucket

        space = self.space
        n_pad = pad_bucket(max(len(Xv), 2))
        meta = _space_meta(space, fix_input)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        # population padded to a device multiple (islands are equal-sized)
        pop_eff = -(-self.pop // n_dev) * n_dev
        ck = (n_pad, meta, n_dev)
        if self.mesh is not None and ck not in self._fused:
            from ..parallel.sharded import make_fused_suggest_sharded

            self._fused[ck] = make_fused_suggest_sharded(
                self.mesh, self.model.core, self._acq, meta,
                n_restarts=self.model.n_restarts,
                iters=self.iters, pop=pop_eff,
                n_obj=self._acq.num_out,
                migrate_every=self.migrate_every,
            )
        if ck not in self._fused:
            core = self.model.core
            acq = self._acq
            R = self.model.n_restarts
            iters = self.iters

            class _Shim:
                @staticmethod
                def predict_pure(state, Xs):
                    samples, caches, d = state
                    mu, var = core.predict_ensemble(samples, caches, d, Xs)
                    return mu * d.y_std + d.y_mean, var * d.y_std**2

            def eval_fn(args, Xc):
                state, pr = args
                return acq.eval_pure(_Shim, state, pr, Xc)

            nd = list(core.numeric_dims)
            D = space.num_cols

            nnd_s = len(nd)
            n_scal = 2 * nnd_s + 5
            n_big = n_pad * (D + 2)

            @jax.jit
            def fused(flat):
                # unpack ONE packed transfer: [big (Nmax,(D+2)) | scal
                # (2*nnd+5,) | init_pop (pop,D)] — each host→device transfer
                # costs ~10 ms through the remote tunnel, so the whole
                # suggest input rides a single array (was 3 transfers).
                from ..models.gp.gp import GPData

                big = flat[:n_big].reshape(n_pad, D + 2)
                scal = flat[n_big : n_big + n_scal]
                init_pop = flat[n_big + n_scal :].reshape(-1, D)
                Xp = big[:, :D]
                yp = big[:, D : D + 1]
                maskp = big[:, D + 1] > 0.5
                nnd = len(nd)
                data = GPData(
                    X=Xp, y=yp, mask=maskp,
                    x_lb=scal[:nnd], x_span=scal[nnd : 2 * nnd],
                    y_mean=scal[2 * nnd], y_std=scal[2 * nnd + 1],
                )
                kappa_ = scal[2 * nnd + 2]
                eps_ = scal[2 * nnd + 3]
                key = jax.random.PRNGKey(scal[2 * nnd + 4].astype(jnp.int32))
                k_fit, k_evo, k_jit = jax.random.split(key, 3)
                keys = jax.random.split(k_fit, R + 1)
                # batched restarts: one optimizer scan over stacked params
                # (gp.fit_from_batched — Pallas slab factorizations on TPU)
                p0 = jax.vmap(lambda kk: core.init_params(kk, data))(
                    keys[:R]
                )
                pf, loss, samples = core.fit_from_batched(
                    keys[R], p0, data
                )  # samples: (S, R, ...)
                best = jnp.argmin(loss)
                pf = jax.tree.map(lambda tt: tt[best], pf)
                samples = jax.tree.map(lambda tt: tt[:, best], samples)
                caches = core.posterior_cache_batched(samples, data)
                state = (samples, caches, data)
                # incumbent prediction (standardized → model frame)
                y_masked = jnp.where(data.mask, data.y[:, 0], jnp.inf)
                b = jnp.argmin(y_masked)
                mu_b, _ = core.predict_ensemble(
                    samples, caches, data, data.X[b][None, :]
                )
                tau = mu_b[0, 0] * data.y_std + data.y_mean
                noise_scale = (
                    jnp.sqrt(jnp.exp(pf.log_noise) + core.noise_lb) * data.y_std
                )
                pr = AcqParams(
                    tau=tau, kappa=kappa_, eps=eps_, key=k_jit, noise=noise_scale
                )
                init = init_pop.at[0].set(data.X[b])
                pop_X, pop_F = evolve_raw(
                    k_evo, init, (state, pr),
                    eval_fn=eval_fn, meta=meta, n_gens=iters,
                )
                mu_pop, var_pop = _Shim.predict_pure(state, pop_X)
                # pack outputs → ONE device→host fetch
                packed_out = jnp.concatenate(
                    [pop_X, pop_F, mu_pop, var_pop], axis=1
                )
                return packed_out, data, pf, samples, caches

            self._fused[ck] = fused

        init_pop = space.sobol_sample_opt(pop_eff, seed=self.num_obs).astype(
            np.float32
        )
        if fix_input:
            for name, val in fix_input.items():
                p = space.params[name]
                c0 = space._col_of[name]
                tv = np.asarray(p.transform(np.asarray([val]))).ravel()
                init_pop[:, c0 : c0 + p.num_cols] = tv[None, :]

        # pack host inputs (3 transfers total: big, scal, init_pop)
        D = space.num_cols
        nd = list(self.model.core.numeric_dims)
        Xv = np.asarray(Xv, np.float32)
        yt = np.asarray(yt, np.float32).reshape(-1, 1)
        n = len(Xv)
        big = np.zeros((n_pad, D + 2), np.float32)
        big[:n, :D] = Xv
        y_mean = float(yt.mean()) if n else 0.0
        y_std = float(yt.std()) if n else 1.0
        y_std = y_std if y_std > 1e-8 else 1.0
        big[:n, D] = ((yt[:, 0] - y_mean) / y_std)
        big[:n, D + 1] = 1.0
        if nd:
            lb = Xv[:, nd].min(axis=0)
            ub = Xv[:, nd].max(axis=0)
        else:
            lb = np.zeros(0, np.float32)
            ub = np.zeros(0, np.float32)
        span = np.where(ub - lb < 1e-8, 1.0, ub - lb)
        scal = np.concatenate(
            [
                lb, span,
                [y_mean, y_std, kappa, 1e-4, float(self.num_obs % (1 << 30))],
            ]
        ).astype(np.float32)

        t0 = time.time()
        if self.mesh is not None:
            # sharded program keeps the 3-array signature (CPU-mesh tests /
            # real multi-chip, where the tunnel round trip is not the cost)
            packed_out, data, pf, samples, caches = self._fused[ck](
                jnp.asarray(big), jnp.asarray(scal), jnp.asarray(init_pop)
            )
        else:
            flat = np.concatenate(
                [big.ravel(), scal, init_pop.astype(np.float32).ravel()]
            )
            packed_out, data, pf, samples, caches = self._fused[ck](
                jnp.asarray(flat)
            )
        out = np.asarray(packed_out)
        dt = time.time() - t0
        self.fit_time.append(dt)  # fused: fit+acq in one program
        self.acq_time.append(dt)
        # expose the fitted posterior on the model wrapper (predict etc.)
        self.model.data = data
        self.model.params = pf
        self.model.samples = samples
        self.model.caches = caches
        n_obj = self._acq.num_out
        pop_X = out[:, :D]
        pop_F = out[:, D : D + n_obj]
        mu_pop = out[:, D + n_obj : D + n_obj + 1]
        var_pop = out[:, D + n_obj + 1 : D + n_obj + 2]
        return space.round_opt(pop_X), pop_F, mu_pop, var_pop
