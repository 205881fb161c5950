"""Episodic-memory attention: local window + retrieved events.

Parity: EM-LLM attention patches (em_llm/attention/dot_product_attention/
torch_impl.py + em_llm.py): each query block attends over (a) its local
sliding window and (b) the KV of retrieved episodic events, concatenated
into one masked dot-product attention — context length is bounded by
window + retrieved size regardless of stream length ("5M token
retrieval", EM-LLM/README.md:11-13).

The end-to-end wrapper ``EMLLMAttention`` maintains the per-layer memory,
segments the stream by surprise as it flows, and answers queries with
retrieval-augmented attention — all compute in one jitted masked-attention
program per block shape.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .memory import EpisodicKVMemory
from .segmentation import segment_events

__all__ = ["masked_attention", "EMLLMAttention"]


@partial(jax.jit, static_argnames=())
def masked_attention(q, k, v, mask):
    """q (Tq, H, Dh), k/v (Tk, H, Dh), mask (Tk,) → (Tq, H, Dh)."""
    d = q.shape[-1]
    logits = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(jnp.float32(d))
    logits = jnp.where(mask[None, None, :], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hqk,khd->qhd", w, v)


class EMLLMAttention:
    """Single-layer episodic attention over an unbounded KV stream."""

    def __init__(
        self,
        n_heads: int,
        head_dim: int,
        local_window: int = 64,
        event_len: int = 32,
        k_sim: int = 4,
        k_contig: int = 1,
        surprise_gamma: float = 1.0,
    ):
        self.H, self.Dh = n_heads, head_dim
        self.local_window = local_window
        self.k_sim = k_sim
        self.k_contig = k_contig
        self.surprise_gamma = surprise_gamma
        self.memory = EpisodicKVMemory(event_len=event_len)
        self._local_k = np.zeros((0, n_heads, head_dim), np.float32)
        self._local_v = np.zeros((0, n_heads, head_dim), np.float32)

    def ingest(self, K: np.ndarray, V: np.ndarray, surprise: np.ndarray):
        """Append a chunk of the stream; overflow beyond the local window
        is segmented into events and archived to episodic memory."""
        self._local_k = np.concatenate([self._local_k, K])
        self._local_v = np.concatenate([self._local_v, V])
        overflow = len(self._local_k) - self.local_window
        if overflow > 0:
            Ko = self._local_k[:overflow]
            Vo = self._local_v[:overflow]
            s = np.asarray(surprise)[-len(K):][:overflow]
            if len(s) < overflow:
                s = np.pad(s, (overflow - len(s), 0), mode="edge")
            spans = segment_events(
                Ko.reshape(len(Ko), -1), s, gamma=self.surprise_gamma,
                min_event=max(4, self.memory.event_len // 4),
            )
            self.memory.add_events(Ko, Vo, spans)
            self._local_k = self._local_k[overflow:]
            self._local_v = self._local_v[overflow:]

    def attend(self, Q: np.ndarray) -> np.ndarray:
        """Retrieval-augmented attention for queries (Tq, H, Dh)."""
        parts_k = [self._local_k]
        parts_v = [self._local_v]
        parts_m = [np.ones(len(self._local_k), bool)]
        ids = self.memory.retrieve(Q, self.k_sim, self.k_contig)
        if ids:
            kk, vv, mm = self.memory.gather_kv(ids)
            parts_k.insert(0, kk)
            parts_v.insert(0, vv)
            parts_m.insert(0, mm)
        K = jnp.asarray(np.concatenate(parts_k), jnp.float32)
        V = jnp.asarray(np.concatenate(parts_v), jnp.float32)
        M = jnp.asarray(np.concatenate(parts_m))
        return np.asarray(
            masked_attention(jnp.asarray(Q, jnp.float32), K, V, M)
        )
