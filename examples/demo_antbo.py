"""Constrained antibody-sequence design (AntBO shape, toy binding)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from hebo_tpu.optimizers.antbo import AntBOOptimizer

def toy_binding(seqs):
    return np.asarray([
        sum(-1.0 if c in "WY" else 0.05 for c in s) for s in seqs
    ]).reshape(-1, 1)

opt = AntBOOptimizer(seq_len=8, n_init=8)
for it in range(8):
    rec = opt.suggest(4)
    seqs = ["".join(r) for _, r in rec.iterrows()]
    opt.observe(rec, toy_binding(seqs))
    print(f"iter {it}  best binding = {opt.best_y:.3f}")
