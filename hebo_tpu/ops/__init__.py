from . import block_chol, cg, chol, pareto, transforms
