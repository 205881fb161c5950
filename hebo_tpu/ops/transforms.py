"""Output transforms: power transform (Box-Cox / Yeo-Johnson) + scalers.

Parity targets:
* reference HEBO power-transforms y before GP fitting — box-cox when y > 0
  else yeo-johnson, with a retry (y.std() < 0.5 → re-standardize) and a
  fallback to raw y on any failure (HEBO/hebo/optimizers/hebo.py:127-147).
* torch Min-Max / Standard scalers (HEBO/hebo/models/scalers.py).

Design: λ-fitting is a tiny 1-D MLE solved once per BO iteration on ≤ a few
thousand scalars — it stays on host (scipy brent, exactly what sklearn
does), while *applying* the transform is a pure jnp function usable inside
jitted programs.  Scalers are pure-pytree (fit returns params; apply is
functional) so they can live inside jitted GP programs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from scipy import optimize, stats

__all__ = [
    "PowerTransform",
    "fit_power_transform",
    "apply_yeo_johnson",
    "StandardScalerParams",
    "fit_standard_scaler",
    "apply_standard_scaler",
    "invert_standard_scaler",
    "MinMaxScalerParams",
    "fit_minmax_scaler",
    "apply_minmax_scaler",
    "invert_minmax_scaler",
    "power_transform_y",
]


class PowerTransform(NamedTuple):
    """Fitted power-transform parameters: method ∈ {0: identity, 1: box-cox,
    2: yeo-johnson}; post-standardization mean/std."""

    method: int
    lmbda: float
    mean: float
    std: float


def _yeo_johnson_np(y: np.ndarray, lmbda: float) -> np.ndarray:
    return stats.yeojohnson(y, lmbda)


def fit_power_transform(y: np.ndarray) -> PowerTransform:
    """Fit λ by MLE on host.  Box-Cox if strictly positive, else Yeo-Johnson;
    standardize afterwards.  Mirrors hebo.py:127-135 incl. the "std < 0.5 →
    refit on standardized y" retry; any failure → identity (":144-147")."""
    y = np.asarray(y, dtype=np.float64).ravel()
    y = y[np.isfinite(y)]
    if y.size < 2 or np.std(y) < 1e-12:
        return PowerTransform(0, 1.0, float(np.mean(y)) if y.size else 0.0, 1.0)
    try:
        if np.all(y > 0):
            _, lmbda = stats.boxcox(y)
            t = stats.boxcox(y, lmbda)
            method = 1
        else:
            _, lmbda = stats.yeojohnson(y)
            t = stats.yeojohnson(y, lmbda)
            method = 2
        if not np.all(np.isfinite(t)):
            raise FloatingPointError("non-finite transformed values")
        std = float(np.std(t))
        if std < 0.5:
            # reference retry: standardize then re-fit
            ys = (y - np.mean(y)) / max(np.std(y), 1e-12)
            if np.all(ys > 0):
                _, lmbda = stats.boxcox(ys)
                t = stats.boxcox(ys, lmbda)
                method = 3  # box-cox on standardized input
            else:
                _, lmbda = stats.yeojohnson(ys)
                t = stats.yeojohnson(ys, lmbda)
                method = 4  # yeo-johnson on standardized input
            if not np.all(np.isfinite(t)):
                raise FloatingPointError("non-finite transformed values")
        mean = float(np.mean(t))
        std = float(np.std(t))
        if std < 1e-12 or not np.isfinite(std):
            raise FloatingPointError("degenerate std")
        return PowerTransform(method, float(lmbda), mean, std)
    except Exception:
        mean = float(np.mean(y))
        std = float(max(np.std(y), 1e-12))
        return PowerTransform(0, 1.0, mean, std)


def apply_yeo_johnson(y: jnp.ndarray, lmbda: float) -> jnp.ndarray:
    """Pure-jnp Yeo-Johnson forward transform (branchless via where)."""
    lam = jnp.asarray(lmbda, y.dtype)
    pos = y >= 0
    eps = 1e-12
    # λ ≈ 0 and λ ≈ 2 limits handled by select
    yp1 = jnp.maximum(y + 1.0, eps)
    t_pos = jnp.where(
        jnp.abs(lam) < 1e-6,
        jnp.log(yp1),
        (jnp.power(yp1, lam) - 1.0) / jnp.where(jnp.abs(lam) < 1e-6, 1.0, lam),
    )
    omy = jnp.maximum(1.0 - y, eps)
    two_m_lam = 2.0 - lam
    t_neg = jnp.where(
        jnp.abs(two_m_lam) < 1e-6,
        -jnp.log(omy),
        -(jnp.power(omy, two_m_lam) - 1.0)
        / jnp.where(jnp.abs(two_m_lam) < 1e-6, 1.0, two_m_lam),
    )
    return jnp.where(pos, t_pos, t_neg)


def _apply_box_cox_np(y: np.ndarray, lmbda: float) -> np.ndarray:
    y = np.maximum(y, 1e-12)
    if abs(lmbda) < 1e-6:
        return np.log(y)
    return (np.power(y, lmbda) - 1.0) / lmbda


def power_transform_y(y: np.ndarray, pt: PowerTransform) -> np.ndarray:
    """Apply a fitted power transform + standardization (host-side numpy).

    Applied to the raw observation vector each BO iteration before padding
    to the device buffer."""
    y = np.asarray(y, dtype=np.float64)
    y0 = y
    if pt.method in (3, 4):
        mu, sd = float(np.nanmean(y0)), max(float(np.nanstd(y0)), 1e-12)
        y = (y - mu) / sd
    if pt.method in (1, 3):
        t = _apply_box_cox_np(y, pt.lmbda)
    elif pt.method in (2, 4):
        t = np.asarray(stats.yeojohnson(y.ravel(), pt.lmbda)).reshape(y.shape)
    else:
        t = y
    return (t - pt.mean) / max(pt.std, 1e-12)


# ----------------------------------------------------------------- scalers
class StandardScalerParams(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray


def fit_standard_scaler(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
    if mask is None:
        mean = jnp.mean(x, axis=0)
        std = jnp.std(x, axis=0)
    else:
        w = mask[:, None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * w, axis=0) / n
        var = jnp.sum(w * (x - mean) ** 2, axis=0) / n
        std = jnp.sqrt(var)
    std = jnp.where(std < 1e-8, 1.0, std)
    return StandardScalerParams(mean, std)


def apply_standard_scaler(p: StandardScalerParams, x: jnp.ndarray) -> jnp.ndarray:
    return (x - p.mean) / p.std


def invert_standard_scaler(p: StandardScalerParams, x: jnp.ndarray) -> jnp.ndarray:
    return x * p.std + p.mean


class MinMaxScalerParams(NamedTuple):
    lb: jnp.ndarray
    ub: jnp.ndarray
    lo: float
    hi: float


def fit_minmax_scaler(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    feature_range=(-1.0, 1.0),
):
    if mask is None:
        lb = jnp.min(x, axis=0)
        ub = jnp.max(x, axis=0)
    else:
        big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
        m = mask[:, None]
        lb = jnp.min(jnp.where(m, x, big), axis=0)
        ub = jnp.max(jnp.where(m, x, -big), axis=0)
    span = jnp.where(ub - lb < 1e-8, 1.0, ub - lb)
    return MinMaxScalerParams(lb, span, feature_range[0], feature_range[1])


def apply_minmax_scaler(p: MinMaxScalerParams, x: jnp.ndarray) -> jnp.ndarray:
    u = (x - p.lb) / p.ub
    return p.lo + u * (p.hi - p.lo)


def invert_minmax_scaler(p: MinMaxScalerParams, x: jnp.ndarray) -> jnp.ndarray:
    u = (x - p.lo) / (p.hi - p.lo)
    return p.lb + u * p.ub
