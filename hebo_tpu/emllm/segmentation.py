"""Surprise-based event segmentation with graph-theoretic refinement.

Parity: EM-LLM (/root/reference/EM-LLM/em_llm/attention/
similarity_refinement/{segmentation,similarity}.py): a token stream is
split into "episodic events" at points of high model surprise
(-log p(token)), then boundaries are refined to maximize the modularity of
the key-similarity graph — tokens within an event should attend alike.

Pure-jnp, fixed shapes: the refinement sweeps each boundary over a local
window and scores intra/inter-event similarity with masked reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["surprise_boundaries", "refine_boundaries", "segment_events"]


def surprise_boundaries(
    surprise: jnp.ndarray, gamma: float = 1.0, min_event: int = 8
) -> np.ndarray:
    """Initial boundaries where surprise(t) > μ + γσ, spaced ≥ min_event.

    surprise: (T,) per-token -log p.  Returns sorted boundary indices
    (host numpy — segmentation is a once-per-chunk host decision)."""
    s = np.asarray(surprise)
    thr = s.mean() + gamma * s.std()
    cand = np.where(s > thr)[0]
    bounds = []
    last = -min_event
    for c in cand:
        if c - last >= min_event:
            bounds.append(int(c))
            last = c
    return np.asarray(bounds, dtype=np.int64)


def _modularity_gain(K: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Intra-event similarity minus expected (the modularity surrogate
    used for boundary refinement)."""
    S = K @ K.T  # (T, T) key-similarity
    same = labels[:, None] == labels[None, :]
    T = K.shape[0]
    intra = jnp.sum(jnp.where(same, S, 0.0)) / (T * T)
    total = jnp.sum(S) / (T * T)
    frac_same = jnp.mean(same.astype(S.dtype))
    return intra - total * frac_same


def refine_boundaries(
    keys: np.ndarray,
    boundaries: np.ndarray,
    window: int = 4,
) -> np.ndarray:
    """Shift each boundary within ±window to the position maximizing the
    similarity-graph modularity (greedy, one pass)."""
    T = len(keys)
    Kn = keys / (np.linalg.norm(keys, axis=1, keepdims=True) + 1e-8)
    K = jnp.asarray(Kn, jnp.float32)
    bounds = list(boundaries)
    for bi in range(len(bounds)):
        lo = bounds[bi - 1] + 1 if bi > 0 else 1
        hi = bounds[bi + 1] - 1 if bi + 1 < len(bounds) else T - 1
        cand = [
            b for b in range(
                max(lo, bounds[bi] - window), min(hi, bounds[bi] + window) + 1
            )
        ]
        if not cand:
            continue
        scores = []
        for b in cand:
            trial = np.asarray(bounds)
            trial[bi] = b
            labels = jnp.asarray(
                np.searchsorted(trial, np.arange(T), side="right")
            )
            scores.append(float(_modularity_gain(K, labels)))
        bounds[bi] = cand[int(np.argmax(scores))]
    return np.asarray(sorted(set(bounds)), dtype=np.int64)


def segment_events(
    keys: np.ndarray,
    surprise: np.ndarray,
    gamma: float = 1.0,
    min_event: int = 8,
    refine_window: int = 4,
):
    """→ list of (start, end) half-open event spans covering [0, T)."""
    T = len(keys)
    b = surprise_boundaries(surprise, gamma, min_event)
    if len(b) > 1:
        b = refine_boundaries(keys, b, refine_window)
    edges = [0] + [int(x) for x in b if 0 < x < T] + [T]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)
            if edges[i + 1] > edges[i]]
