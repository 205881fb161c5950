"""Episodic KV memory with two-stage retrieval + device sharding.

Parity: EM-LLM ``context_manager``
(/root/reference/EM-LLM/em_llm/attention/context_manager.py:326-425):
per-layer KV cache split into episodic events, each summarized by
representative tokens; retrieval into the attention window is two-stage —
(1) **similarity**: top-k_s events by query·representative score,
(2) **contiguity**: temporal neighbors of the retrieved events — and the
memory is sharded across ``world_size`` devices.

TPU-native: events live in fixed-shape padded buffers (n_events, L_event,
H, Dh).  The reference offloads to CPU and shards across GPUs; here the
event axis shards across the TPU mesh with ``shard_map`` — each device
scores its shard and the global top-k merges via ``all_gather`` of
(score, index) pairs (tiny), so only the winning events' KV move.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EpisodicKVMemory", "retrieve_sharded"]


class EpisodicKVMemory:
    """Append-only episodic store for one layer (single-host buffers)."""

    def __init__(self, event_len: int = 32, n_rep: int = 4):
        self.event_len = event_len
        self.n_rep = n_rep
        self._k: List[np.ndarray] = []  # per event (L, H, Dh) padded
        self._v: List[np.ndarray] = []
        self._reps: List[np.ndarray] = []  # (n_rep, H, Dh)
        self._lens: List[int] = []

    def __len__(self):
        return len(self._k)

    def add_events(self, K: np.ndarray, V: np.ndarray, spans):
        """K, V: (T, H, Dh); spans: list of (start, end)."""
        L = self.event_len
        for s, e in spans:
            ke, ve = K[s:e], V[s:e]
            n = len(ke)
            if n == 0:
                continue
            kp = np.zeros((L, K.shape[1], K.shape[2]), K.dtype)
            vp = np.zeros_like(kp)
            kp[: min(n, L)] = ke[:L]
            vp[: min(n, L)] = ve[:L]
            # representatives: the highest-norm keys (salient tokens)
            norms = np.linalg.norm(ke.reshape(n, -1), axis=1)
            idx = np.argsort(-norms)[: self.n_rep]
            reps = np.zeros((self.n_rep, K.shape[1], K.shape[2]), K.dtype)
            reps[: len(idx)] = ke[idx]
            self._k.append(kp)
            self._v.append(vp)
            self._reps.append(reps)
            self._lens.append(min(n, L))

    def buffers(self):
        """Stacked (E, L, H, Dh) K/V, (E, n_rep, H, Dh) reps, (E,) lens."""
        if not self._k:
            return None
        return (
            np.stack(self._k),
            np.stack(self._v),
            np.stack(self._reps),
            np.asarray(self._lens),
        )

    def retrieve(
        self, q: np.ndarray, k_sim: int = 4, k_contig: int = 2,
        mode: str = "reps",
    ) -> List[int]:
        """Two-stage retrieval for query block q (Tq, H, Dh) →
        event indices (similarity winners + temporal neighbors).

        ``mode="reps"`` scores the high-norm representative keys (fast,
        the original behavior); ``mode="full"`` max-pools the attention
        score q·k over EVERY stored key row and head per event and over
        the query tokens — the needle-finding mode (high-norm reps can
        simply miss the matching key; measured on the tiny-LM eval)."""
        if not self._k:
            return []
        if mode == "full":
            K = np.stack(self._k)  # (E, L, H, Dh)
            E, L, H, Dh = K.shape
            lens = np.asarray(self._lens)
            valid = np.arange(L)[None, :] < lens[:, None]  # (E, L)
            # (E, L, H) scores for each query token, max-pooled
            sc = np.full(E, -np.inf, np.float32)
            for qt in q.reshape(-1, H, Dh):
                s_t = np.einsum("elhd,hd->elh", K, qt)
                s_t = np.where(valid[:, :, None], s_t, -np.inf)
                sc = np.maximum(sc, s_t.max(axis=(1, 2)))
            scores = sc
        else:
            reps = np.stack(self._reps)  # (E, R, H, Dh)
            qf = q.reshape(-1, q.shape[-2] * q.shape[-1]).mean(0)
            rf = reps.reshape(len(reps), self.n_rep, -1).max(axis=1)
            scores = rf @ qf
        top = np.argsort(-scores)[:k_sim]
        chosen = set(int(t) for t in top)
        for t in top:  # contiguity stage
            for d in range(1, k_contig + 1):
                if t - d >= 0:
                    chosen.add(int(t - d))
                if t + d < len(self._k):
                    chosen.add(int(t + d))
        return sorted(chosen)

    def gather_kv(self, event_ids: List[int]):
        """(Lr, H, Dh) concatenated K/V + validity mask for retrieved ids."""
        ks, vs, ms = [], [], []
        for i in event_ids:
            n = self._lens[i]
            ks.append(self._k[i])
            vs.append(self._v[i])
            m = np.zeros(self.event_len, bool)
            m[:n] = True
            ms.append(m)
        if not ks:
            return None
        return np.concatenate(ks), np.concatenate(vs), np.concatenate(ms)


def retrieve_sharded(
    mesh,
    reps: jnp.ndarray,  # (E, F) flattened representative features
    q: jnp.ndarray,  # (F,)
    k_sim: int = 4,
    axis: str = "mem",
):
    """Device-sharded similarity stage: each device scores its event shard,
    (score, global-index) pairs all_gather and the host-free top-k merge
    happens on every device (the world_size-sharding analog)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    E = reps.shape[0]
    n_dev = mesh.devices.size
    per = E // n_dev

    def local(reps_blk, q_full):
        d = jax.lax.axis_index(axis)
        scores = reps_blk @ q_full  # (per,)
        idx = jnp.arange(per) + d * per
        top_s, top_i = jax.lax.top_k(scores, min(k_sim, per))
        gi = idx[top_i]
        all_s = jax.lax.all_gather(top_s, axis).reshape(-1)
        all_i = jax.lax.all_gather(gi, axis).reshape(-1)
        s2, i2 = jax.lax.top_k(all_s, k_sim)
        return all_i[i2]

    smapped = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False,
    )
    reps_sh = jax.device_put(reps, NamedSharding(mesh, P(axis)))
    return jax.jit(smapped)(reps_sh, q)
