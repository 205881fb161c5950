"""Mix-and-match combinatorial BO: presets on the pest-control task."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hebo_tpu.optimizers.bo_builder import BO_ALGOS
from hebo_tpu.tasks import PestControlTask

task = PestControlTask(n_stations=10)
for name in ["Casmopolitan", "COMBO", "BOCS"]:
    opt = BO_ALGOS[name].build_bo(task.space, n_init=8)
    for _ in range(8):
        rec = opt.suggest(4)
        opt.observe(rec, task(rec))
    print(f"{name:14s} best cost = {opt.best_y:.3f}")
