"""Diagnose the SVM regret gap (VERDICT r3 #5).

`regret_vs_reference.json`'s svm row shows the torch proxy below the jax
HEBO at EVERY iteration (`jax_leq_torch_frac: 0.0`).  But unlike the
synthetic rows — where both arms share the exact same init and t=0
incumbents match to the digit — the svm arms draw their OWN inits from
their own RNG paths, and the t=0 means already differ (0.535 vs 0.5155).
A constant init offset propagates down the whole incumbent curve, so
per-iteration dominance over a shared-init-free protocol cannot
distinguish "worse BO behavior" from "different init draw distribution".

This harness removes that confound: per seed, BOTH pipelines observe the
SAME 8 init configurations (log-uniform over the identical log10-space
box + uniform kernel), then run the same 16x4 model-based budget.  The
evaluation cache guarantees identical y values for identical configs.

Verdict rules mirror regret_vs_reference.py.  If the dominance vanishes
under shared inits, the r3 gap is attributable to init-distribution
noise, not pipeline behavior; if it persists, the next ablations
(power-transform fallback, kappa schedule, noise floor, fit schedule)
have a clean baseline to toggle against.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/svm_regret_diagnosis.py [--seeds 10]

Writes experiments/svm_regret_diagnosis.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.reference_torch_hebo import TorchHEBO  # noqa: E402

KERNELS = ["rbf", "poly", "sigmoid"]
LOG_BOX = {"C": (-2.0, 3.0), "gamma": (-4.0, 1.0), "epsilon": (-3.0, 0.0)}
N_INIT = 8


class CachedSVM:
    """SVMTuningTask behind a config-keyed cache: identical configs get
    identical y in both arms (and init evals are paid once)."""

    def __init__(self):
        from hebo_tpu.tasks.ml_tuning import SVMTuningTask

        self.task = SVMTuningTask()
        self.cache = {}

    def eval_raw(self, C, gamma, epsilon, kernel):
        key = (round(float(C), 8), round(float(gamma), 8),
               round(float(epsilon), 8), kernel)
        if key not in self.cache:
            import pandas as pd

            df = pd.DataFrame({
                "C": [C], "gamma": [gamma], "epsilon": [epsilon],
                "kernel": [kernel],
            })
            self.cache[key] = float(np.asarray(self.task(df)).ravel()[0])
        return self.cache[key]

    def eval_df(self, df):
        return np.asarray([
            self.eval_raw(row["C"], row["gamma"], row["epsilon"],
                          str(row["kernel"]))
            for _, row in df.iterrows()
        ])[:, None]

    def eval_log(self, X):
        return np.asarray([
            self.eval_raw(10.0 ** x[0], 10.0 ** x[1], 10.0 ** x[2],
                          KERNELS[int(x[3])])
            for x in X
        ])[:, None]


def shared_init(seed):
    rng = np.random.default_rng(10_000 + seed)
    logs = np.stack([
        rng.uniform(*LOG_BOX["C"], N_INIT),
        rng.uniform(*LOG_BOX["gamma"], N_INIT),
        rng.uniform(*LOG_BOX["epsilon"], N_INIT),
        rng.integers(0, 3, N_INIT).astype(float),
    ], axis=1)
    return logs  # (N_INIT, 4) in log10/cat-code space


def run_jax(task, seed, iters, batch):
    import pandas as pd

    from hebo_tpu import HEBO

    opt = HEBO(task.task.space, scramble_seed=seed)
    init = shared_init(seed)
    df = pd.DataFrame({
        "C": 10.0 ** init[:, 0],
        "gamma": 10.0 ** init[:, 1],
        "epsilon": 10.0 ** init[:, 2],
        "kernel": [KERNELS[int(k)] for k in init[:, 3]],
    })
    opt.observe(df, task.eval_df(df))
    best = [float(opt.best_y)]
    for _ in range(iters):
        rec = opt.suggest(batch)
        opt.observe(rec, task.eval_df(rec))
        best.append(float(opt.best_y))
    return np.asarray(best)


def run_torch(task, seed, iters, batch):
    space = [
        {"name": "C", "type": "num", "lb": -2.0, "ub": 3.0},
        {"name": "gamma", "type": "num", "lb": -4.0, "ub": 1.0},
        {"name": "epsilon", "type": "num", "lb": -3.0, "ub": 0.0},
        {"name": "kernel", "type": "cat", "n_cats": 3},
    ]
    opt = TorchHEBO(space, seed=seed)
    init = shared_init(seed)
    opt.observe(init, task.eval_log(init))
    best = [float(opt.best_y)]
    for _ in range(iters):
        rec = opt.suggest(batch)
        opt.observe(rec, task.eval_log(rec))
        best.append(float(opt.best_y))
    return np.asarray(best)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    curves = {"jax": [], "torch": []}
    walls = {"jax": 0.0, "torch": 0.0}
    for seed in range(args.seeds):
        task = CachedSVM()  # shared cache per seed → identical init y
        for fw, run in (("jax", run_jax), ("torch", run_torch)):
            t0 = time.time()
            curves[fw].append(run(task, seed, args.iters, args.batch))
            walls[fw] += time.time() - t0
        assert curves["jax"][-1][0] == curves["torch"][-1][0], (
            "shared init must give identical t=0 incumbents"
        )
        print(f"seed {seed}: t0 {curves['jax'][-1][0]:.4f} "
              f"jax {curves['jax'][-1][-1]:.4f} "
              f"torch {curves['torch'][-1][-1]:.4f}", flush=True)

    a, b = np.stack(curves["jax"]), np.stack(curves["torch"])
    ma, mb = a.mean(0), b.mean(0)
    jax_leq_frac = float((ma <= mb + 1e-12).mean())
    ja, j2 = a[:, -1].mean(), 2 * a[:, -1].std(ddof=1) / np.sqrt(len(a))
    tb, t2 = b[:, -1].mean(), 2 * b[:, -1].std(ddof=1) / np.sqrt(len(b))
    if ja + j2 < tb - t2:
        verdict = "jax_better"
    elif tb + t2 < ja - j2:
        verdict = "torch_better"
    else:
        verdict = "parity"
    out = {
        "protocol": {
            "seeds": args.seeds, "iters": args.iters, "batch": args.batch,
            "shared_init": N_INIT,
            "note": "both arms observe IDENTICAL 8-point log-uniform inits "
                    "per seed (cached evals, t=0 incumbents equal by "
                    "construction) — removes the init-draw confound behind "
                    "regret_vs_reference.json svm jax_leq_torch_frac=0.0",
        },
        "jax_curve_mean": [round(float(v), 5) for v in ma],
        "torch_curve_mean": [round(float(v), 5) for v in mb],
        "jax_final_mean_2se": [round(float(ja), 5), round(float(j2), 5)],
        "torch_final_mean_2se": [round(float(tb), 5), round(float(t2), 5)],
        "jax_leq_torch_frac": jax_leq_frac,
        "verdict": verdict,
        "wall_s": {k: round(v, 1) for k, v in walls.items()},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "svm_regret_diagnosis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("jax_final_mean_2se", "torch_final_mean_2se",
                       "jax_leq_torch_frac", "verdict")}))
    print("wrote", path)


if __name__ == "__main__":
    main()
