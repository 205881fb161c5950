"""Merge sharded Bayesmark study results into bayesmark_results.json.

The r5 breadth expansion (VERDICT r4 next #4) runs new studies in
parallel shard processes (2-CPU box); this merges shard outputs with the
committed r4 16-study artifact, recomputes per-study signal flags for
rows that predate them, and emits BOTH aggregates (final-round and
mean-over-rounds) over all studies and over the signal-carrying subset.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
      python experiments/bayesmark_merge.py shardA.json shardB.json
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASE = os.path.join(HERE, "bayesmark_results.json")


def signal_rel(row):
    base, opt = row["random_base_final"], row["opt_estimate"]
    return float((base - opt) / max(abs(base), abs(opt), 1e-9))


def main():
    with open(BASE) as f:
        base = json.load(f)
    rows = {r["task"]: r for r in base["tasks"]}
    for path in sys.argv[1:]:
        with open(path) as f:
            shard = json.load(f)
        for r in (shard if isinstance(shard, list) else
                  shard.get("tasks", [])):
            rows[r["task"]] = r
    for r in rows.values():
        if "baseline_signal_rel" not in r:
            r["baseline_signal_rel"] = round(signal_rel(r), 6)
            r["no_signal"] = bool(r["baseline_signal_rel"] < 1e-3)
    tasks = sorted(rows.values(), key=lambda r: r["task"])
    live = [r for r in tasks if not r["no_signal"]]

    def agg(rs, key):
        return round(float(np.mean([r[key] for r in rs])), 2)

    def se2_within(rs):
        ses = [r["final_score_2se"] / 2.0 for r in rs]
        return round(float(2 * np.sqrt(np.sum(np.square(ses))) / len(rs)), 2)

    out = dict(base)
    out["tasks"] = tasks
    out["protocol"]["n_studies"] = len(tasks)
    out["protocol"]["breadth_note"] = (
        "r5: 8 model classes (DT/kNN/SVM/RF/ada/MLP/lasso/linear) x up to "
        "4 datasets (breast/diabetes/wine/iris), 10 seeds; saga-based "
        "lasso/linear classification studies included (not excluded as in "
        "r4); per-study no_signal flag marks studies whose random baseline "
        "final ~= pooled optimum (every method clips to 100 there)"
    )
    out["aggregate_final_round"] = agg(tasks, "final_score_mean")
    out["aggregate_mean_over_rounds"] = agg(tasks, "mean_over_rounds_score")
    out["aggregate_final_round_2se_within"] = se2_within(tasks)
    out["n_no_signal_studies"] = int(len(tasks) - len(live))
    out["aggregate_final_round_signal_only"] = agg(live, "final_score_mean")
    out["aggregate_mean_over_rounds_signal_only"] = agg(
        live, "mean_over_rounds_score"
    )
    out["aggregate_final_round_2se_within_signal_only"] = se2_within(live)
    with open(BASE, "w") as f:
        json.dump(out, f, indent=2)
    print(f"{len(tasks)} studies ({len(live)} with signal); "
          f"final {out['aggregate_final_round']} "
          f"(signal-only {out['aggregate_final_round_signal_only']}); "
          f"mean-over-rounds {out['aggregate_mean_over_rounds']} "
          f"(signal-only {out['aggregate_mean_over_rounds_signal_only']})")


if __name__ == "__main__":
    main()
