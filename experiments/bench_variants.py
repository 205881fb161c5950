"""Suggest-latency sweep over fit-schedule variants (run on TPU).

The fused suggest's device time is dominated by the sequential pSGLD
chain (each step = one N×N Cholesky fwd+bwd).  Variants trade sequential
steps for vmapped parallel restarts (same total fit work, fewer
sequential dependencies) and NSGA-II generations.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(tag, model_config, iters, n_timed=5):
    from hebo_tpu import HEBO
    from hebo_tpu.tasks import Ackley

    task = Ackley(dim=6)
    opt = HEBO(task.space, model_config=model_config, iters=iters)
    init = opt.quasi_sample(200)
    opt.observe(init, task(init))
    rec = opt.suggest(8)
    opt.observe(rec, task(rec))
    times = []
    for _ in range(n_timed):
        t0 = time.time()
        rec = opt.suggest(8)
        times.append(time.time() - t0)
        opt.observe(rec, task(rec))
    med = float(np.median(times))
    print(json.dumps({
        "variant": tag, "suggest_s": round(med, 4),
        "best_y": round(opt.best_y, 3),
    }), flush=True)
    return med


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    run_variant("e100_r1_g100 (default)", {"num_epochs": 100}, 100)
    run_variant("e50_r2_g100", {"num_epochs": 50, "n_restarts": 2}, 100)
    run_variant("e34_r3_g100", {"num_epochs": 34, "n_restarts": 3}, 100)
    run_variant("e100_r1_g50", {"num_epochs": 100}, 50)


if __name__ == "__main__":
    main()
