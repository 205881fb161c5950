"""Post-process regret_vs_reference.json: add interpretation fields.

Band overlap < 1 can mean EITHER framework diverges; record in whose
favor (mean regret lower) each non-overlapping iteration falls.
"""
import json
import os

import numpy as np


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "regret_vs_reference.json")
    with open(path) as f:
        d = json.load(f)
    for task, r in d.items():
        a = np.asarray(r["jax_curve_mean"])
        b = np.asarray(r["torch_curve_mean"])
        jax_better = float(np.mean(a <= b))
        r["jax_leq_torch_frac"] = round(jax_better, 3)
        r["verdict"] = (
            "parity" if r["band_overlap_frac"] >= 0.8 else
            ("jax_better" if jax_better >= 0.5 else "torch_better")
        )
    with open(path, "w") as f:
        json.dump(d, f, indent=2)
    print({k: (v["verdict"], v["band_overlap_frac"], v["jax_leq_torch_frac"])
           for k, v in d.items()})


if __name__ == "__main__":
    main()
