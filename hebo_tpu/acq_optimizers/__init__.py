from .evolution import EvolutionOpt, evolve, evolve_raw, EvolveSpaceMeta
from .mcbo_opts import (
    AcqOptimizerBase,
    GeneticAlgoAcqOptimizer,
    InterleavedSearchAcqOptimizer,
    LocalSearchAcqOptimizer,
    MixedMabAcqOptimizer,
    RandomSearchAcqOptimizer,
    SimulatedAnnealingAcqOptimizer,
)
