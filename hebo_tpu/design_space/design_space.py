"""DesignSpace: the user↔optimizer frame bridge.

Capability parity with the reference ``DesignSpace``
(/root/reference/HEBO/hebo/design_space/design_space.py:23-120) and MCBO
``SearchSpace`` (/root/reference/MCBO/mcbo/search_space/search_space.py:28-277):
``parse`` a list of param spec dicts, ``transform`` a DataFrame of user-frame
points into the opt frame, ``inverse_transform`` back, expose box bounds and
type-index metadata, and ``sample`` uniformly / quasi-randomly.

TPU-first differences from the reference
----------------------------------------
* The opt frame is ONE rectangular float64 numpy array ``(n, D)`` (converted
  to f32 on device) instead of the reference's ragged ``(FloatTensor xc,
  LongTensor xe)`` pair.  Static column-index lists (``numeric_dims``,
  ``cat_dims``, ...) let jitted code slice fixed columns without dynamic
  shapes.
* Sampling uses scrambled Sobol (scipy.stats.qmc) at the host rim — init
  sampling is O(n·D) tiny and happens once per optimization, so it stays
  off-device by design; everything downstream is device-resident.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
from scipy.stats import qmc

from .param import PARAM_REGISTRY, Parameter

__all__ = ["DesignSpace"]


class DesignSpace:
    """Typed mixed design space with a single flat opt-frame tensor."""

    def __init__(self, params: Optional[Sequence[Dict[str, Any]]] = None):
        self.params: Dict[str, Parameter] = {}
        self.param_order: List[str] = []
        if params is not None:
            self.parse(params)

    # ------------------------------------------------------------------ parse
    def parse(self, specs: Sequence[Dict[str, Any]]) -> "DesignSpace":
        self.params = {}
        self.param_order = []
        for spec in specs:
            ptype = spec.get("type", "num")
            if ptype not in PARAM_REGISTRY:
                raise ValueError(
                    f"Unknown param type {ptype!r}; known: {sorted(PARAM_REGISTRY)}"
                )
            p = PARAM_REGISTRY[ptype](spec)
            if p.name in self.params:
                raise ValueError(f"Duplicate param name {p.name!r}")
            self.params[p.name] = p
            self.param_order.append(p.name)
        self._build_index()
        return self

    def _build_index(self):
        """Precompute static per-column metadata used by jitted code."""
        col = 0
        self._col_of: Dict[str, int] = {}
        self.numeric_dims: List[int] = []
        self.discrete_numeric_dims: List[int] = []  # subset of numeric: rounded
        self.cat_dims: List[int] = []
        self.perm_dims: List[int] = []  # flattened perm columns
        self.perm_blocks: List[List[int]] = []  # per perm-param column blocks
        lbs, ubs, ncats = [], [], []
        for name in self.param_order:
            p = self.params[name]
            self._col_of[name] = col
            for j in range(p.num_cols):
                c = col + j
                lbs.append(p.opt_lb)
                ubs.append(p.opt_ub)
                ncats.append(p.num_categories)
                if p.is_permutation:
                    self.perm_dims.append(c)
                elif p.is_categorical:
                    self.cat_dims.append(c)
                else:
                    self.numeric_dims.append(c)
                    if p.is_discrete_after_transform:
                        self.discrete_numeric_dims.append(c)
            if p.is_permutation:
                self.perm_blocks.append(list(range(col, col + p.num_cols)))
            col += p.num_cols
        self.num_cols = col
        self.opt_lb = np.asarray(lbs, dtype=np.float64)
        self.opt_ub = np.asarray(ubs, dtype=np.float64)
        self.num_categories = np.asarray(ncats, dtype=np.int64)

    # -------------------------------------------------------------- properties
    @property
    def num_params(self) -> int:
        return len(self.param_order)

    @property
    def num_numeric(self) -> int:
        return len(self.numeric_dims)

    @property
    def num_categorical(self) -> int:
        return len(self.cat_dims)

    @property
    def num_paras(self) -> int:  # reference-compatible alias
        return self.num_params

    def __len__(self):
        return self.num_params

    def __getitem__(self, name: str) -> Parameter:
        return self.params[name]

    def __contains__(self, name: str) -> bool:
        return name in self.params

    # ------------------------------------------------------------- transforms
    def transform(self, df: pd.DataFrame) -> np.ndarray:
        """User frame (DataFrame) → opt frame ``(n, num_cols)`` float64."""
        n = len(df)
        out = np.empty((n, self.num_cols), dtype=np.float64)
        for name in self.param_order:
            p = self.params[name]
            c = self._col_of[name]
            vals = p.transform(df[name].values)
            if p.num_cols == 1:
                out[:, c] = np.asarray(vals, dtype=np.float64).ravel()
            else:
                out[:, c : c + p.num_cols] = np.asarray(vals, dtype=np.float64)
        return out

    def inverse_transform(self, x: np.ndarray) -> pd.DataFrame:
        """Opt frame ``(n, num_cols)`` → user frame DataFrame."""
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[None, :]
        data = {}
        for name in self.param_order:
            p = self.params[name]
            c = self._col_of[name]
            if p.num_cols == 1:
                data[name] = p.inverse_transform(x[:, c])
            else:
                data[name] = p.inverse_transform(x[:, c : c + p.num_cols])
        return pd.DataFrame(data, columns=self.param_order)

    def round_opt(self, x: np.ndarray) -> np.ndarray:
        """Snap discrete opt-frame columns to valid values (round + clip;
        permutation blocks projected via double-argsort)."""
        x = np.array(x, dtype=np.float64, copy=True)
        flat = x.reshape(-1, x.shape[-1])
        d = self.discrete_numeric_dims + self.cat_dims
        if d:
            flat[:, d] = np.round(flat[:, d])
        flat[:] = np.clip(flat, self.opt_lb, self.opt_ub)
        for block in self.perm_blocks:
            sub = flat[:, block]
            flat[:, block] = np.argsort(np.argsort(sub, axis=1), axis=1)
        return flat.reshape(x.shape)

    # ---------------------------------------------------------------- sampling
    def sample(self, n: int, seed: Optional[int] = None) -> pd.DataFrame:
        """Uniform random sample in the user frame."""
        rng = np.random.default_rng(seed)
        cols = {}
        x = np.empty((n, self.num_cols), dtype=np.float64)
        for name in self.param_order:
            p = self.params[name]
            c = self._col_of[name]
            s = p.sample(n, rng)
            if p.num_cols == 1:
                x[:, c] = s
            else:
                x[:, c : c + p.num_cols] = s
        del cols
        return self.inverse_transform(self.round_opt(x))

    def sobol_sample_opt(self, n: int, seed: Optional[int] = None) -> np.ndarray:
        """Scrambled-Sobol quasi-random sample in the *opt frame*.

        Parity: reference ``HEBO.quasi_sample``
        (hebo/optimizers/hebo.py:63-75): Sobol draw → scale to [lb, ub] →
        round discrete columns.  Permutation blocks fall back to random
        permutations (Sobol has no meaning there).
        """
        eng = qmc.Sobol(d=self.num_cols, scramble=True, seed=seed)
        m = max(1, int(np.ceil(np.log2(max(n, 2)))))
        u = eng.random_base2(m)[:n]  # power-of-2 draw keeps balance props
        x = self.opt_lb + u * (self.opt_ub - self.opt_lb)
        if self.perm_blocks:
            rng = np.random.default_rng(seed)
            for block in self.perm_blocks:
                for i in range(n):
                    x[i, block] = rng.permutation(len(block))
        return self.round_opt(x)

    def sobol_sample(self, n: int, seed: Optional[int] = None) -> pd.DataFrame:
        return self.inverse_transform(self.sobol_sample_opt(n, seed))
