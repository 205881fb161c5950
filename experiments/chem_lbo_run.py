"""T-LBO chem weighted-retraining run → regret-curve artifact.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/chem_lbo_run.py

Writes experiments/chem_lbo_curve.json: best penalized-logP proxy per
iteration for the weighted-retraining latent BO vs a random-sampling
baseline at equal molecule budget (the reference compares the same way,
robust_opt_scripts/robust_opt_chem.py).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hebo_tpu.latent.chem import (  # noqa: E402
    ChemLatentBO,
    decode_tokens,
    penalized_logp_proxy,
    random_molecules,
)


def main(n_iters=12, batch=4, seeds=10):
    import jax

    curves_bo, curves_rs = [], []
    for seed in range(seeds):
        # each seed compiles fresh programs (the closure-over-state VAE
        # retraining path retraces); without this the accumulated JIT
        # code mappings exhaust the process map budget around seed 3-4
        # ("LLVM compilation error: Cannot allocate memory")
        jax.clear_caches()
        bo = ChemLatentBO(n_init=96, vae_steps=150, retrain_every=4, seed=seed)
        curve = [bo.best_y]
        for _ in range(n_iters):
            curve.append(bo.step(batch=batch))
        curves_bo.append(curve)

        # random baseline with the identical evaluation budget
        rng_best = []
        toks = random_molecules(96, 24, seed)
        ys = [penalized_logp_proxy(decode_tokens(t)) for t in toks]
        best = max(ys)
        rng_best.append(best)
        for i in range(n_iters):
            extra = random_molecules(batch, 24, 1000 + seed * 100 + i)
            best = max(best, max(
                penalized_logp_proxy(decode_tokens(t)) for t in extra
            ))
            rng_best.append(best)
        curves_rs.append(rng_best)
        print(f"seed {seed}: BO {curve[-1]:.3f} vs RS {rng_best[-1]:.3f}",
              flush=True)

    bo_f = np.asarray([c[-1] for c in curves_bo], float)
    rs_f = np.asarray([c[-1] for c in curves_rs], float)
    se2 = lambda v: float(2 * v.std(ddof=1) / np.sqrt(len(v)))
    out = {
        "objective": "penalized_logp_proxy (maximize)",
        "seeds": seeds,
        "batch": batch,
        "bo_mean_curve": [round(float(v), 4) for v in np.mean(curves_bo, 0)],
        "rs_mean_curve": [round(float(v), 4) for v in np.mean(curves_rs, 0)],
        "bo_final_mean": round(float(bo_f.mean()), 4),
        "rs_final_mean": round(float(rs_f.mean()), 4),
        "bo_final_vals": [round(float(v), 4) for v in bo_f],
        "rs_final_vals": [round(float(v), 4) for v in rs_f],
        "bo_final_2se": round(se2(bo_f), 4),
        "rs_final_2se": round(se2(rs_f), 4),
        # claim the win only when 2SE bands separate (VERDICT r2 weak #3)
        "verdict": (
            "bo_better_separated"
            if bo_f.mean() - se2(bo_f) > rs_f.mean() + se2(rs_f)
            else "no_separation_at_2se"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "chem_lbo_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, out["bo_final_mean"], "vs RS", out["rs_final_mean"])


if __name__ == "__main__":
    main()
