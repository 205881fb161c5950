from .evolution import EvolutionOpt, evolve, EvolveSpaceMeta
