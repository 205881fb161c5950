"""Constrained multi-objective BO with EHVI batch selection."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from hebo_tpu import DesignSpace
from hebo_tpu.optimizers import GeneralBO

space = DesignSpace([{"name": "x0", "type": "num", "lb": -2, "ub": 4}])

def objectives(df):
    x = df["x0"].values.astype(float)
    return np.stack([x**2, (x - 2.0) ** 2], axis=1)

opt = GeneralBO(space, num_obj=2)
for _ in range(12):
    rec = opt.suggest(4)
    opt.observe(rec, objectives(rec))
X_pf, Y_pf = opt.get_pf()
print("Pareto front points:")
print(X_pf.assign(f1=Y_pf[:, 0], f2=Y_pf[:, 1]).round(3))
