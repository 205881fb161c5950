"""hebo_tpu — TPU-native Bayesian-optimization framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of the
huawei-noah/HEBO monorepo (see SURVEY.md).  Public API mirrors the
reference's ask/tell contract:

    from hebo_tpu import DesignSpace, HEBO
    space = DesignSpace([{'name': 'x', 'type': 'num', 'lb': -5, 'ub': 5}])
    opt = HEBO(space)
    for _ in range(32):
        rec = opt.suggest(n_suggestions=8)
        opt.observe(rec, objective(rec))
"""

from .design_space import DesignSpace

__version__ = "0.1.0"

__all__ = ["DesignSpace", "__version__"]


def __getattr__(name):
    # Lazy imports keep `import hebo_tpu` light (no jax compile at import).
    if name in ("HEBO", "BO", "GeneralBO", "CMAES", "Evolution", "NoisyOpt"):
        from . import optimizers

        return getattr(optimizers, name)
    if name == "get_model":
        from .models import get_model

        return get_model
    raise AttributeError(name)
