from .param import (
    PARAM_REGISTRY,
    BoolParam,
    CategoricalParam,
    IntegerParam,
    IntExponentParam,
    NumericParam,
    OrdinalParam,
    Parameter,
    PermutationParam,
    PowIntegerParam,
    PowParam,
    StepIntParam,
    register_param,
)
from .design_space import DesignSpace

__all__ = [
    "DesignSpace",
    "Parameter",
    "PARAM_REGISTRY",
    "register_param",
    "NumericParam",
    "PowParam",
    "IntegerParam",
    "PowIntegerParam",
    "IntExponentParam",
    "StepIntParam",
    "BoolParam",
    "CategoricalParam",
    "OrdinalParam",
    "PermutationParam",
]
