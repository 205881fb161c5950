"""MACEBO — the Bayesmark-protocol optimizer (NeurIPS-2020 submission shape).

Parity: the reference's archived winning submission
(HEBO/archived_submissions/hebo/optimizer.py — class ``MACEBO``): a
Bayesmark ``AbstractOptimizer`` that wraps the HEBO pipeline behind the
challenge's dict-based suggest/observe protocol.  Bayesmark hands the
optimizer an ``api_config`` and calls ``suggest(n_suggestions) ->
[ {param: value}, ... ]`` then ``observe(guesses, losses)``.

The device pipeline underneath is unchanged (``hebo_tpu.optimizers.HEBO``);
this class only adapts the frame: api_config → DesignSpace
(``parse_space_from_bayesmark``), list-of-dicts ⇄ DataFrame.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pandas as pd

from .hebo import HEBO
from .util import parse_space_from_bayesmark

__all__ = ["MACEBO"]


class MACEBO:
    primary_import = "hebo_tpu"

    def __init__(self, api_config: Dict[str, dict], **hebo_kwargs):
        self.api_config = api_config
        self.space = parse_space_from_bayesmark(api_config)
        self.opt = HEBO(self.space, **hebo_kwargs)

    def suggest(self, n_suggestions: int = 1) -> List[dict]:
        rec = self.opt.suggest(n_suggestions)
        out = []
        for _, row in rec.iterrows():
            guess = {}
            for name, cfg in self.api_config.items():
                v = row[name]
                if cfg["type"] == "int":
                    v = int(round(float(v)))
                elif cfg["type"] == "bool":
                    v = bool(int(round(float(v))))
                elif cfg["type"] == "real":
                    v = float(v)
                guess[name] = v
            out.append(guess)
        return out

    def observe(self, X: Sequence[dict], y: Sequence[float]) -> None:
        df = pd.DataFrame(list(X))
        yv = np.asarray(list(y), dtype=float).reshape(-1, 1)
        # Bayesmark reports non-finite losses for crashed configs; HEBO's
        # observe path filters them (reference filter_nan, models/util.py:6-18)
        self.opt.observe(df, yv)

    @property
    def best_x(self):
        return self.opt.best_x

    @property
    def best_y(self):
        return self.opt.best_y
