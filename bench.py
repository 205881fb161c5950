"""Benchmark: HEBO suggest-step wall-clock on Ackley-6D (batch=8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's only citable per-suggest cost is ~7.8 s/suggest
(HEBO on the AntBO 11-mer antigen space, CPU —
/root/reference/AntBO/results_data/HEBO_optim_res.csv `Suggest Time`
column, rows 1-3: 7.6-8.1 s; BASELINE.md).  ``vs_baseline`` is the speedup
factor  baseline_seconds / our_seconds  (higher is better).

Protocol: seed 120 Sobol observations (one padding bucket), run one warmup
suggest to compile, then time 5 steady-state suggests (model fit + MACE +
NSGA-II pop=100 × 100 gens + batch selection) and report the median.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: the fused suggest program is compiled
    # once per padding bucket; caching makes repeat bench runs start fast
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from hebo_tpu import HEBO
    from hebo_tpu.tasks import Ackley

    task = Ackley(dim=6)
    space = task.space
    opt = HEBO(space)  # default fit schedule (see experiments/bench_variants)

    # seed history: 200 quasi-random points → N stays inside the 256
    # padding bucket for the warmup + 5 timed suggests (one compile)
    init = opt.quasi_sample(200)
    opt.observe(init, task(init))

    # warmup (compiles fit + evolve programs for this bucket)
    rec = opt.suggest(8)
    opt.observe(rec, task(rec))

    times = []
    for _ in range(5):
        t0 = time.time()
        rec = opt.suggest(8)
        times.append(time.time() - t0)
        opt.observe(rec, task(rec))

    value = float(np.median(times))
    baseline = 7.8
    print(
        json.dumps(
            {
                "metric": "hebo_suggest_latency_ackley6d_b8",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(baseline / value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
