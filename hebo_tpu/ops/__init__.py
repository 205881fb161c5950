from . import chol, pareto, transforms
