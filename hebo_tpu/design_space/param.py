"""Typed parameter definitions for the design space.

Capability parity with the reference parameter registry
(/root/reference/HEBO/hebo/design_space/*.py and
/root/reference/MCBO/mcbo/search_space/params/*.py): num, pow, int,
pow_int, int_exponent, step_int, bool, cat(egorical), ordinal, and
permutation parameter types, each defining a bijection between the
"user frame" (python values / DataFrame cells) and the "opt frame"
(a continuous or integer-coded box the optimizer searches).

TPU-first design notes
----------------------
Unlike the reference (which materialises per-parameter torch tensors and
splits numeric vs categorical columns into two ragged tensors), every
parameter here exposes *scalar numpy* transforms used only at the API rim;
the hot path operates on a single fixed-width float array per point where:

  * numeric-like params occupy one column holding the *transformed*
    (e.g. log-scaled) continuous value,
  * categorical/ordinal params occupy one column holding the integer code
    as a float,
  * permutation params occupy ``length`` columns holding a permutation of
    ``0..length-1`` as floats.

This keeps device buffers rectangular and statically shaped, which is what
XLA wants.  All randomness flows through explicit ``numpy.random.Generator``
objects at the rim; on-device sampling uses JAX PRNG keys.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import numpy as np

__all__ = [
    "Parameter",
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
    "PARAM_REGISTRY",
    "register_param",
]


class Parameter:
    """Base class for one typed parameter.

    Subclasses define the scalar maps ``transform`` (user → opt frame) and
    ``inverse_transform`` (opt → user frame), plus box bounds ``opt_lb`` /
    ``opt_ub`` in the opt frame.  ``is_discrete_after_transform`` marks
    columns that must be rounded to integers inside the optimizer.
    """

    param_type: str = "base"

    def __init__(self, spec: Dict[str, Any]):
        self.name: str = spec["name"]
        self.spec = dict(spec)

    # -- frame maps (vectorised over numpy arrays) -------------------------
    def transform(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    # -- opt-frame box -----------------------------------------------------
    @property
    def opt_lb(self) -> float:
        raise NotImplementedError

    @property
    def opt_ub(self) -> float:
        raise NotImplementedError

    # -- classification flags ---------------------------------------------
    @property
    def is_numeric(self) -> bool:
        return False

    @property
    def is_categorical(self) -> bool:
        return False

    @property
    def is_ordinal(self) -> bool:
        return False

    @property
    def is_permutation(self) -> bool:
        return False

    @property
    def is_discrete_after_transform(self) -> bool:
        """True if the opt-frame column only takes integer values."""
        return False

    @property
    def num_cols(self) -> int:
        """Number of opt-frame columns this parameter occupies."""
        return 1

    @property
    def num_categories(self) -> int:
        """Category count for categorical-like params (0 otherwise)."""
        return 0

    def sample(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """Sample n values in the *opt frame* uniformly."""
        lb, ub = self.opt_lb, self.opt_ub
        if self.is_discrete_after_transform:
            return rng.integers(int(lb), int(ub) + 1, size=n).astype(np.float64)
        return rng.uniform(lb, ub, size=n)


class NumericParam(Parameter):
    """Continuous parameter, identity transform.

    Parity: reference ``NumericPara`` (design_space/numeric_param.py:77-111).
    """

    param_type = "num"

    def __init__(self, spec):
        super().__init__(spec)
        self.lb = float(spec["lb"])
        self.ub = float(spec["ub"])
        assert self.lb <= self.ub, f"{self.name}: lb > ub"

    def transform(self, x):
        return np.asarray(x, dtype=np.float64)

    def inverse_transform(self, x):
        return np.clip(np.asarray(x, dtype=np.float64), self.lb, self.ub)

    @property
    def opt_lb(self):
        return self.lb

    @property
    def opt_ub(self):
        return self.ub

    @property
    def is_numeric(self):
        return True


class PowParam(Parameter):
    """Log-scale continuous parameter: searched in ``log_base(x)``.

    Parity: reference ``PowPara`` (design_space/pow_param.py:125-160),
    default base 10.
    """

    param_type = "pow"

    def __init__(self, spec):
        super().__init__(spec)
        self.lb = float(spec["lb"])
        self.ub = float(spec["ub"])
        self.base = float(spec.get("base", 10.0))
        assert self.lb > 0, f"{self.name}: pow param needs lb > 0"
        self._log_base = math.log(self.base)

    def transform(self, x):
        return np.log(np.asarray(x, dtype=np.float64)) / self._log_base

    def inverse_transform(self, x):
        v = np.power(self.base, np.asarray(x, dtype=np.float64))
        return np.clip(v, self.lb, self.ub)

    @property
    def opt_lb(self):
        return math.log(self.lb) / self._log_base

    @property
    def opt_ub(self):
        return math.log(self.ub) / self._log_base

    @property
    def is_numeric(self):
        return True


class IntegerParam(Parameter):
    """Integer box parameter; continuous in opt frame, rounded on inverse.

    Parity: reference ``IntegerPara`` (design_space/integer_param.py:236+).
    """

    param_type = "int"

    def __init__(self, spec):
        super().__init__(spec)
        self.lb = int(spec["lb"])
        self.ub = int(spec["ub"])

    def transform(self, x):
        return np.asarray(x, dtype=np.float64)

    def inverse_transform(self, x):
        v = np.round(np.asarray(x, dtype=np.float64)).astype(np.int64)
        return np.clip(v, self.lb, self.ub)

    @property
    def opt_lb(self):
        return float(self.lb)

    @property
    def opt_ub(self):
        return float(self.ub)

    @property
    def is_numeric(self):
        return True

    @property
    def is_discrete_after_transform(self):
        # integer box: the opt frame itself is integral (pymoo Integer-var
        # semantics in the reference EvolutionOpt)
        return True


class PowIntegerParam(PowParam):
    """Log-scale integer parameter.

    Parity: reference ``PowIntegerPara`` (design_space/pow_integer_param.py).
    """

    param_type = "pow_int"

    def inverse_transform(self, x):
        v = np.power(self.base, np.asarray(x, dtype=np.float64))
        v = np.round(v).astype(np.int64)
        return np.clip(v, int(self.lb), int(self.ub))


class IntExponentParam(Parameter):
    """Values ``base ** k`` for integer exponent k; search over k.

    Parity: reference ``IntExponentPara`` (design_space/int_exponent_param.py).
    """

    param_type = "int_exponent"

    def __init__(self, spec):
        super().__init__(spec)
        self.base = float(spec.get("base", 2.0))
        self.lb = float(spec["lb"])  # user-frame value, e.g. 16
        self.ub = float(spec["ub"])  # user-frame value, e.g. 1024
        self._k_lb = int(round(math.log(self.lb) / math.log(self.base)))
        self._k_ub = int(round(math.log(self.ub) / math.log(self.base)))

    def transform(self, x):
        return np.round(
            np.log(np.asarray(x, dtype=np.float64)) / math.log(self.base)
        )

    def inverse_transform(self, x):
        k = np.clip(np.round(np.asarray(x, dtype=np.float64)), self._k_lb, self._k_ub)
        return np.power(self.base, k).astype(np.int64)

    @property
    def opt_lb(self):
        return float(self._k_lb)

    @property
    def opt_ub(self):
        return float(self._k_ub)

    @property
    def is_numeric(self):
        return True

    @property
    def is_discrete_after_transform(self):
        return True


class StepIntParam(Parameter):
    """Grid ``lb + k * step``; search over the index k.

    Parity: reference ``StepIntPara`` (design_space/step_int.py).
    """

    param_type = "step_int"

    def __init__(self, spec):
        super().__init__(spec)
        self.lb = int(spec["lb"])
        self.ub = int(spec["ub"])
        self.step = int(spec["step"])
        assert (self.ub - self.lb) % self.step == 0, (
            f"{self.name}: (ub - lb) must be divisible by step"
        )
        self._n_steps = (self.ub - self.lb) // self.step

    def transform(self, x):
        return (np.asarray(x, dtype=np.float64) - self.lb) / self.step

    def inverse_transform(self, x):
        k = np.clip(np.round(np.asarray(x, dtype=np.float64)), 0, self._n_steps)
        return (k * self.step + self.lb).astype(np.int64)

    @property
    def opt_lb(self):
        return 0.0

    @property
    def opt_ub(self):
        return float(self._n_steps)

    @property
    def is_numeric(self):
        return True

    @property
    def is_discrete_after_transform(self):
        return True


class BoolParam(Parameter):
    """Boolean treated as {0,1} numeric (avoids one-hot dim blowup).

    Parity: reference ``BoolPara`` (design_space/bool_param.py).
    """

    param_type = "bool"

    def transform(self, x):
        return np.asarray(x).astype(np.float64)

    def inverse_transform(self, x):
        return np.round(np.asarray(x, dtype=np.float64)).astype(bool)

    @property
    def opt_lb(self):
        return 0.0

    @property
    def opt_ub(self):
        return 1.0

    @property
    def is_numeric(self):
        return True

    @property
    def is_discrete_after_transform(self):
        return True


class CategoricalParam(Parameter):
    """Unordered categories mapped to integer codes.

    Parity: reference ``CategoricalPara``
    (design_space/categorical_param.py:173-222).
    """

    param_type = "cat"

    def __init__(self, spec):
        super().__init__(spec)
        self.categories: List[Any] = list(spec["categories"])
        self._cat2idx = {c: i for i, c in enumerate(self.categories)}
        self._idx2cat = np.asarray(self.categories, dtype=object)

    def transform(self, x):
        x = np.asarray(x, dtype=object).ravel()
        return np.asarray([self._cat2idx[v] for v in x], dtype=np.float64)

    def inverse_transform(self, x):
        idx = np.clip(
            np.round(np.asarray(x, dtype=np.float64)).astype(np.int64),
            0,
            len(self.categories) - 1,
        )
        return self._idx2cat[idx]

    @property
    def opt_lb(self):
        return 0.0

    @property
    def opt_ub(self):
        return float(len(self.categories) - 1)

    @property
    def is_categorical(self):
        return True

    @property
    def is_discrete_after_transform(self):
        return True

    @property
    def num_categories(self):
        return len(self.categories)


class OrdinalParam(CategoricalParam):
    """Ordered categories: integer code is meaningful as a magnitude.

    Parity: MCBO ordinal params (search_space/search_space.py:28-277).
    """

    param_type = "ordinal"

    @property
    def is_categorical(self):
        return False

    @property
    def is_ordinal(self):
        return True

    @property
    def is_numeric(self):
        # ordinal codes live on the numeric path (distance is meaningful)
        return True


class PermutationParam(Parameter):
    """Permutation of ``length`` items; occupies ``length`` opt columns.

    Parity: MCBO ``PermutationPara``
    (search_space/params/permutation_param.py:4-21).
    """

    param_type = "perm"

    def __init__(self, spec):
        super().__init__(spec)
        self.length = int(spec["length"])

    def transform(self, x):
        # x: sequence of permutations (n, length) in user frame (tuples/lists)
        arr = np.asarray([list(p) for p in np.asarray(x, dtype=object).ravel()])
        return arr.astype(np.float64)

    def inverse_transform(self, x):
        x = np.asarray(x, dtype=np.float64).reshape(-1, self.length)
        # Repair: project each row onto the closest permutation via argsort.
        codes = np.argsort(np.argsort(x, axis=1), axis=1)
        return [tuple(int(v) for v in row) for row in codes]

    @property
    def opt_lb(self):
        return 0.0

    @property
    def opt_ub(self):
        return float(self.length - 1)

    @property
    def is_permutation(self):
        return True

    @property
    def is_discrete_after_transform(self):
        return True

    @property
    def num_cols(self):
        return self.length

    def sample(self, n, rng):
        return np.stack([rng.permutation(self.length) for _ in range(n)]).astype(
            np.float64
        )


class SigmoidParam(Parameter):
    """Value in (0, 1) searched in logit space.

    Parity: MCBO ``SigmoidPara`` (search_space/params/sigmoid_param.py:9-31) —
    the optimizer sees ``logit(x)`` so probability-like parameters get a
    symmetric, unbounded-feeling search axis; ``inverse_transform`` applies
    the sigmoid and clips back into the user box.
    """

    param_type = "sigmoid"

    def __init__(self, spec):
        super().__init__(spec)
        self.lb = float(spec.get("lb", 1e-4))
        self.ub = float(spec.get("ub", 1.0 - 1e-4))
        assert 0.0 < self.lb < self.ub < 1.0, (
            f"{self.name}: sigmoid param needs 0 < lb < ub < 1"
        )

    @staticmethod
    def _logit(x):
        x = np.asarray(x, dtype=np.float64)
        return np.log(x) - np.log1p(-x)

    def transform(self, x):
        return self._logit(np.clip(np.asarray(x, dtype=np.float64), self.lb, self.ub))

    def inverse_transform(self, x):
        v = 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))
        return np.clip(v, self.lb, self.ub)

    @property
    def opt_lb(self):
        return float(self._logit(self.lb))

    @property
    def opt_ub(self):
        return float(self._logit(self.ub))

    @property
    def is_numeric(self):
        return True


PARAM_REGISTRY: Dict[str, type] = {}


def register_param(cls: type) -> type:
    PARAM_REGISTRY[cls.param_type] = cls
    return cls


for _cls in (
    NumericParam,
    PowParam,
    IntegerParam,
    PowIntegerParam,
    IntExponentParam,
    StepIntParam,
    BoolParam,
    CategoricalParam,
    OrdinalParam,
    PermutationParam,
    SigmoidParam,
):
    register_param(_cls)
