"""Regret-parity evidence: HEBO on the reference's quick-start tasks.

BASELINE.md asks to "match reference posterior moments and regret curves
within MC error on Ackley/Branin".  The reference's published artifacts
are claims, not tables (SURVEY.md §6); the reproducible check is the
quick-start behavior: HEBO reaches near-optimum on Branin-2D and makes
steady progress on Ackley-6D within a few hundred evaluations.

Run:  python experiments/regret_check.py [--seeds 3] [--evals 160]
Writes experiments/regret_results.json with per-seed best-so-far curves
and prints a summary line per task.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_task(task_name, n_seeds, max_evals, batch):
    from hebo_tpu import HEBO
    from hebo_tpu.tasks import get_task
    from hebo_tpu.utils.plotting import best_so_far

    curves = []
    for seed in range(n_seeds):
        task = get_task(task_name, dim=6) if task_name == "ackley" else get_task(task_name)
        opt = HEBO(task.space, scramble_seed=seed,
                   model_config={"num_epochs": 100})
        t0 = time.time()
        while opt.num_obs < max_evals:
            rec = opt.suggest(batch)
            opt.observe(rec, task(rec))
        curves.append(best_so_far(opt.y[:, 0]).tolist())
        print(f"  {task_name} seed {seed}: best={opt.best_y:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    return curves, float(task.fmin)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--evals", type=int, default=160)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    results = {}
    for name, threshold in [("branin", 0.5), ("ackley", 5.0)]:
        print(f"[{name}]", flush=True)
        curves, fmin = run_task(name, args.seeds, args.evals, args.batch)
        finals = [c[-1] for c in curves]
        regrets = [f - fmin for f in finals]
        ok = np.median(regrets) < threshold
        results[name] = {
            "curves": curves,
            "fmin": fmin,
            "final_regrets": regrets,
            "threshold": threshold,
            "pass": bool(ok),
        }
        print(f"  median final regret {np.median(regrets):.4f} "
              f"(threshold {threshold}) → {'PASS' if ok else 'FAIL'}")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "regret_results.json")
    with open(out, "w") as f:
        json.dump(results, f)
    print("wrote", out)
    return 0 if all(r["pass"] for r in results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
