from .synthetic import (
    Ackley, Branin, Hartmann6, Levy, Rosenbrock, Schwefel, StyblinskiTang,
    SyntheticTask, get_task,
)
from .eda import EDASeqOptTask, random_aag
from .pest import PestControlTask
from .rna import RNAInverseFoldTask, nussinov_fold
from .boils import BoilsTask, SynthesisSession
from .hpob import SyntheticHPOBTask, TabularBenchmark
from .lasso import LassoBenchTask
from .bayesmark import BayesmarkTask
