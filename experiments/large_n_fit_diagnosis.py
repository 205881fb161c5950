"""Diagnose the BENCH_r04 large-N fit regression (VERDICT r4 next #3).

BENCH r3→r4: ``gp_fit_n3600_s`` 0.189→0.243, ``gp_fit_n7000_s``
0.204→0.266 (+~30%) in the round the slab kernel was wired into the fit
path.  Hypothesis (confirmed by this harness): the large-N fit
subsamples to ``max_cholesky_size=2048`` and runs ``fit_from_batched``
with the default ``n_restarts=1`` — so every pSGLD step factorized ONE
(1, 2048, 2048) system through the slab kernel, whose serial pivot
chain has zero batch amortization at B=1 (slab_probe.json r4 already
showed the kernel losing at (8, 2048)).  The r5 fix gates
``ops/chol._use_slab`` on the batch too (slab only when B·128 ≥ N).

This harness times the SAME fit under (a) the r5 gated build and
(b) the r4 behavior (gate forced open, monkeypatched), 5 repeated
measures each, on the real chip.  Writes
experiments/large_n_fit_diagnosis.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import pandas as pd

    import hebo_tpu.ops.chol as chol_mod
    from hebo_tpu.models import get_model
    from hebo_tpu.tasks.synthetic import Ackley

    print("backend:", jax.default_backend(), flush=True)
    gate_r5 = chol_mod._use_slab

    def gate_r4(n, b=None):  # r4 behavior: shape-only gate
        return gate_r5(n, None)

    out = {"reps": 5, "rows": [],
           "note": "fit wall seconds, min/median over reps; r4_gate "
                   "forces the slab kernel at every supported N "
                   "(including the subsampled fit's (1, 2048) systems), "
                   "r5_gate requires B*128 >= N; caveat: the r4_gate arm "
                   "forces the gate open over TODAY'S stage-2 (m2) "
                   "kernels, so its penalty understates the r4-era "
                   "regression, which combined the ungated route with "
                   "the slower r4 kernels and a contended host"}
    for n_obs in (3600, 7000):
        sp = Ackley(dim=6).space
        rng = np.random.default_rng(0)
        df = pd.DataFrame(
            {f"x{i}": rng.uniform(-5, 5, n_obs) for i in range(6)})
        yv = (np.sum(df.values**2, axis=1, keepdims=True)
              .astype(np.float32) / 10)
        Xv = sp.transform(df)
        row = {"n_obs": n_obs}
        for name, gate in (("r5_gate", gate_r5), ("r4_gate", gate_r4)):
            chol_mod._use_slab = gate
            mdl = get_model("gp", sp, num_epochs=50)
            # sync via device_get: block_until_ready is NOT a barrier
            # through the async axon relay (same flaw the r4 microbench
            # fixed) — a device->host read must wait for the computation
            mdl.fit(Xv, yv)  # compile/warm
            jax.device_get(mdl.caches.alpha)
            ts = []
            for _ in range(5):
                t0 = time.time()
                mdl.fit(Xv, yv)
                jax.device_get(mdl.caches.alpha)
                ts.append(time.time() - t0)
            row[name + "_min_s"] = round(min(ts), 4)
            row[name + "_med_s"] = round(float(np.median(ts)), 4)
            print(name, n_obs, [round(t, 3) for t in ts], flush=True)
        chol_mod._use_slab = gate_r5
        row["r3_bench_s"] = {"3600": 0.1891, "7000": 0.2038}[str(n_obs)]
        row["r4_bench_s"] = {"3600": 0.2431, "7000": 0.2657}[str(n_obs)]
        out["rows"].append(row)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "large_n_fit_diagnosis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
