"""Quick start: HEBO on Ackley-6D (the reference README demo shape)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hebo_tpu import HEBO
from hebo_tpu.tasks import Ackley

task = Ackley(dim=6)
opt = HEBO(task.space)
for it in range(16):
    rec = opt.suggest(8)
    opt.observe(rec, task(rec))
    print(f"iter {it:2d}  best_y = {opt.best_y:.4f}")
print("best point:\n", opt.best_x)
