"""Mix-and-match BO builder + named algorithm presets.

Parity: MCBO ``BoBuilder`` and the BoBase suggest/observe loop
(MCBO/mcbo/optimizers/bo_builder.py:125-583, bo_base.py:71-429): compose
model_id × acq_opt_id × acq_func_id × tr_id into a working optimizer, with
named presets ``BO_ALGOS`` — Casmopolitan, BOiLS, COMBO, BODi, BOCS, BOSS,
CoCaBO, RDUCB (bo_builder.py:574-583).

Usage (mirrors MCBO/README.md:113-137)::

    from hebo_tpu.optimizers.bo_builder import BoBuilder, BO_ALGOS
    opt = BoBuilder(model_id="gp_to", acq_opt_id="is",
                    acq_func_id="ei", tr_id="basic").build_bo(space, n_init=10)
    opt = BO_ALGOS["Casmopolitan"].build_bo(space, n_init=10)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..acquisitions.acq import (
    CEI,
    EI,
    LCB,
    MACE,
    PI,
    AcqParams,
    AddLCB,
    ThompsonSampling,
)
from ..acq_optimizers.mcbo_opts import (
    GeneticAlgoAcqOptimizer,
    InterleavedSearchAcqOptimizer,
    LocalSearchAcqOptimizer,
    MixedMabAcqOptimizer,
    RandomSearchAcqOptimizer,
    SimulatedAnnealingAcqOptimizer,
)
from ..models import get_model
from ..trust_region.casmo import CasmopolitanTrManager, ProxyTrManager
from .base import AbstractOptimizer

__all__ = ["BoBuilder", "BO_ALGOS", "MCBOptimizer"]


ACQ_FUNC_REGISTRY = {
    "ei": EI,
    "pi": PI,
    "lcb": LCB,
    "ucb": LCB,
    "ts": ThompsonSampling,
    "mace": MACE,
    "cei": CEI,
    "addlcb": AddLCB,
}

def _mp_factory(space, **kw):
    from ..acq_optimizers.message_passing import MessagePassingOptimizer

    return MessagePassingOptimizer(space, **kw)


ACQ_OPT_REGISTRY = {
    "is": InterleavedSearchAcqOptimizer,
    "ls": LocalSearchAcqOptimizer,
    "sa": SimulatedAnnealingAcqOptimizer,
    "mab": MixedMabAcqOptimizer,
    "ga": GeneticAlgoAcqOptimizer,
    "rs": RandomSearchAcqOptimizer,
    "mp": _mp_factory,
}

# model_id → (get_model name, extra conf)
MODEL_REGISTRY_MAP = {
    "gp": ("gp", {}),
    "gp_o": ("gp", {"cat_kernel": "overlap"}),
    "gp_to": ("gp", {"cat_kernel": "transformed_overlap"}),
    "gp_diffusion": ("gp", {"cat_kernel": "diffusion"}),
    "gp_hed": ("gp", {"cat_kernel": "hed"}),
    "gp_ssk": ("gp", {"cat_kernel": "ssk"}),
    "gp_rd": ("gp_rd", {}),
    "lin_reg": ("lin_reg", {}),
    "deep_ensemble": ("deep_ensemble", {}),
    "rf": ("rf", {}),
    "svgp": ("svgp", {}),
    "gbdt": ("gbdt", {}),
    "catboost": ("catboost", {}),
}


class MCBOptimizer(AbstractOptimizer):
    """BoBase-parity loop: rand-init drain → TR restart check → model fit
    → incumbent → TR-restricted acquisition optimization; observe updates
    the TR radii (bo_base.py:209-339)."""

    support_combinatorial = True
    support_parallel_opt = True

    def __init__(
        self,
        space,
        model,
        acq_func,
        acq_optimizer,
        tr_manager,
        n_init: int = 10,
        kappa: float = 2.0,
        csv_save_path: Optional[str] = None,
        name: str = "MCBO",
        relearn_every: Optional[int] = None,
        batch_strategy: str = "topk",  # 'topk' | 'kb' (Kriging believer)
    ):
        super().__init__(space, csv_save_path)
        self.model = model
        self.acq_func = acq_func
        self.acq_optimizer = acq_optimizer
        self.tr_manager = tr_manager
        self.n_init = n_init
        self.kappa = kappa
        self.name = name
        # RDUCB: resample the random decomposition every k observations
        # (learnDependencyStructureRate, RDUCB algorithms.py:266-340)
        self.relearn_every = relearn_every
        # 'kb': batch>1 via Kriging-believer hallucinations — append each
        # suggestion as a fake observation at its posterior mean and refit
        # before the next pick (MCBO utils/model_utils.py:28,
        # interleaved_search_acq_optimizer.py:130-143)
        self.batch_strategy = batch_strategy
        self._suggest_count = 0
        self._init_queue = None
        self._sobol_count = 0

    def method_suggest(self, n_suggestions=1, fix_input=None):
        import time

        if self.num_obs < self.n_init:
            X = self.space.sobol_sample_opt(
                n_suggestions, seed=self._sobol_count
            )
            self._sobol_count += 1
            return self.space.inverse_transform(X)

        if self.tr_manager.needs_restart:
            self.tr_manager.restart(seed=self.num_obs)

        self._suggest_count += 1
        if (
            self.relearn_every
            and hasattr(self.model, "resample_decomposition")
            and self._suggest_count % self.relearn_every == 0
        ):
            self.model.resample_decomposition()

        X = self.space.transform(self.X)
        y = self.y[:, :1].copy()
        ok = np.isfinite(y[:, 0])
        Xv, yv = X[ok], y[ok]
        ys = (yv - yv.mean()) / max(yv.std(), 1e-12)

        t0 = time.time()
        self.model.fit(Xv, ys)
        self.fit_time.append(time.time() - t0)

        best_id = int(np.argmin(ys[:, 0]))
        if self.tr_manager.center is None:
            self.tr_manager.register_center(Xv[best_id])
        tau = float(ys[best_id, 0])
        params = AcqParams(
            tau=jnp.float32(tau),
            kappa=jnp.float32(self.kappa),
            key=jax.random.PRNGKey(self.num_obs),
            noise=jnp.float32(math.sqrt(max(float(self.model.noise[0]), 0.0))),
        )
        t0 = time.time()
        if self.batch_strategy == "kb" and n_suggestions > 1:
            recs = []
            X_aug, y_aug = Xv.copy(), ys.copy()
            for j in range(n_suggestions):
                r = self.acq_optimizer.optimize(
                    self.model, self.acq_func, params,
                    n_suggestions=1, x_observed=X_aug,
                    tr_manager=self.tr_manager, seed=self.num_obs + j,
                )
                recs.append(r[0])
                # hallucinate the observation at the posterior mean + refit
                mu_h, _ = self.model.predict(r[:1])
                X_aug = np.vstack([X_aug, r[:1]])
                y_aug = np.vstack([y_aug, mu_h[:, :1]])
                self.model.fit(X_aug, y_aug)
            # restore the model to the real data for the next iteration
            self.model.fit(Xv, ys)
            rec = np.stack(recs)
        else:
            rec = self.acq_optimizer.optimize(
                self.model, self.acq_func, params,
                n_suggestions=n_suggestions,
                x_observed=Xv,
                tr_manager=self.tr_manager,
                seed=self.num_obs,
            )
        self.acq_time.append(time.time() - t0)
        return self.space.inverse_transform(rec)

    def observe_new_data(self, Xdf, y):
        y0 = np.asarray(y[:, 0], float)
        fin = y0[np.isfinite(y0)]
        if len(fin) == 0:
            return
        prev_best = self.best_y if self.num_obs > len(Xdf) else math.inf
        self.tr_manager.adjust(float(np.min(fin)), prev_best)
        # re-center TR on the global incumbent
        Xn = self.space.transform(self.X)
        self.tr_manager.register_center(Xn[self.best_id])


@dataclass
class BoBuilder:
    model_id: str = "gp_to"
    acq_opt_id: str = "is"
    acq_func_id: str = "ei"
    tr_id: Optional[str] = "basic"
    model_kwargs: Dict = field(default_factory=dict)
    acq_opt_kwargs: Dict = field(default_factory=dict)
    tr_kwargs: Dict = field(default_factory=dict)
    name: str = "BO"

    def build_bo(self, search_space, n_init: int = 10, seed: int = 0,
                 **opt_kwargs) -> MCBOptimizer:
        model_name, extra = MODEL_REGISTRY_MAP[self.model_id]
        conf = {**extra, **self.model_kwargs}
        conf.setdefault("num_epochs", 50)
        model = get_model(model_name, search_space, num_out=1, **conf)
        acq = ACQ_FUNC_REGISTRY[self.acq_func_id]()
        acq_opt = ACQ_OPT_REGISTRY[self.acq_opt_id](
            search_space, **self.acq_opt_kwargs
        )
        if self.tr_id in (None, "none"):
            tr = ProxyTrManager(search_space)
        else:
            tr = CasmopolitanTrManager(search_space, seed=seed, **self.tr_kwargs)
        return MCBOptimizer(
            search_space, model, acq, acq_opt, tr,
            n_init=n_init, name=self.name, **opt_kwargs,
        )


# Named presets (MCBO bo_builder.py:574-583).  RDUCB is registered by
# hebo_tpu.models.rd (random-decomposition GP + message passing).
BO_ALGOS: Dict[str, BoBuilder] = {
    "Casmopolitan": BoBuilder("gp_to", "is", "ei", "basic", name="Casmopolitan"),
    "BOiLS": BoBuilder("gp_ssk", "is", "ei", "basic", name="BOiLS"),
    "COMBO": BoBuilder("gp_diffusion", "ls", "ei", "none", name="COMBO"),
    "BODi": BoBuilder("gp_hed", "is", "ei", "basic", name="BODi"),
    "BOCS": BoBuilder("lin_reg", "sa", "ts", "none", name="BOCS"),
    "BOSS": BoBuilder("gp_ssk", "ga", "ei", "none", name="BOSS"),
    "CoCaBO": BoBuilder("gp_to", "mab", "ei", "none", name="CoCaBO"),
    "RDUCB": BoBuilder("gp_rd", "mp", "lcb", "none", name="RDUCB"),
}
