from .synthetic import (
    Ackley, Branin, Hartmann6, Levy, Rosenbrock, Schwefel, StyblinskiTang,
    SyntheticTask, get_task,
)
from .eda import EDASeqOptTask, random_aag
