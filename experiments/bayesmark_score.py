"""Bayesmark-style end-to-end scoring harness (NeurIPS-2020 BBO protocol).

Runs HEBO against the random-search baseline on the sklearn HPO suite
(hebo_tpu/tasks/bayesmark.py) under the challenge protocol — 16 rounds of
batch-8 suggest/observe — and reports per-task and aggregate normalized
scores (100 = task optimum, 0 = random-search parity).  The reference's
claim to beat: the archived HEBO submission won the challenge leaderboard
(HEBO/README.md:6-12, archived_submissions/hebo/).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/bayesmark_score.py \
      [--rounds 16] [--batch 8] [--fast]
"""

import argparse
import json
import time

import numpy as np


def run_optimizer(task, rounds, batch, seed):
    from hebo_tpu import HEBO

    opt = HEBO(task.space, scramble_seed=seed)
    best = np.inf
    for _ in range(rounds):
        rec = opt.suggest(batch)
        y = task(rec)
        opt.observe(rec, y)
        finite = y[np.isfinite(y[:, 0]), 0]
        if len(finite):
            best = min(best, float(finite.min()))
    return best


def run_random(task, rounds, batch, seed):
    best = np.inf
    df = task.space.sample(rounds * batch, seed=seed)
    y = task(df)
    finite = y[np.isfinite(y[:, 0]), 0]
    if len(finite):
        best = float(finite.min())
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rand-repeats", type=int, default=3)
    ap.add_argument("--fast", action="store_true",
                    help="2 tasks, 6 rounds (smoke)")
    ap.add_argument("--out", default="experiments/bayesmark_results.json")
    args = ap.parse_args()

    from hebo_tpu.tasks.bayesmark import normalized_score, suite

    if args.fast:
        tasks = suite(models=("SVM", "DT"), datasets=("breast",))
        rounds = 6
    else:
        tasks = suite()
        rounds = args.rounds

    results = []
    for task in tasks:
        t0 = time.time()
        rand_bests = [
            run_random(task, rounds, args.batch, seed=100 + r)
            for r in range(args.rand_repeats)
        ]
        opt_best = run_optimizer(task, rounds, args.batch, seed=0)
        task_min = min([opt_best] + rand_bests)
        score = normalized_score(opt_best, float(np.mean(rand_bests)), task_min)
        results.append(
            {
                "task": task.name,
                "opt_best": opt_best,
                "random_best_mean": float(np.mean(rand_bests)),
                "norm_score": score,
                "wall_s": round(time.time() - t0, 1),
            }
        )
        print(
            f"{task.name:16s} HEBO {opt_best:.4f}  random {np.mean(rand_bests):.4f}"
            f"  score {score:6.1f}  ({results[-1]['wall_s']}s)"
        )

    agg = float(np.mean([r["norm_score"] for r in results]))
    print(f"\naggregate normalized score: {agg:.1f} over {len(results)} tasks")
    with open(args.out, "w") as f:
        json.dump({"aggregate": agg, "tasks": results}, f, indent=2)


if __name__ == "__main__":
    main()
