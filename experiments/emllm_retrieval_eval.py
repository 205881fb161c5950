"""EM-LLM retrieval quality at long context — hermetic needle eval.

VERDICT r2 missing #5: the reference validates EM-LLM on
LongBench/∞-Bench (EM-LLM/benchmark/); this repo's HF path was only
smoke-tested.  This harness measures retrieval quality *hermetically*
(no trained LM, no network): a deterministic embedding model generates
a topic-drifting token stream of 32k–131k tokens with needle facts
planted at random positions, the stream is ingested chunk-by-chunk
through the episodic pipeline (surprise segmentation → event store →
two-stage similarity+contiguity retrieval, emllm/{segmentation,
memory}.py), and each needle's key-phrase query must retrieve the event
containing its position.

Reported per context length:
* hit rate vs the **full-attention oracle** (exact argmax of q·k over
  every token key — verified 1.0 by construction, so the EM-LLM number
  is directly the recall of the episodic approximation);
* recency / random event-selection baselines at the same event budget;
* the fraction of KV actually moved into the window (the efficiency
  the episodic design buys).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/emllm_retrieval_eval.py

Writes experiments/emllm_retrieval_eval.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hebo_tpu.emllm.memory import EpisodicKVMemory
from hebo_tpu.emllm.segmentation import segment_events

DIM = 64
HEADS = 2
DH = DIM // HEADS
CHUNK = 1024
N_NEEDLES = 10
N_TOPICS = 32
STREAM_SEEDS = (0, 1, 2)
LENGTHS = (32768, 65536, 131072)
EVENT_BUDGET_SIM = 4
EVENT_BUDGET_CONTIG = 1


def build_stream(rng, T):
    """Topic-drifting background + planted needles.

    Background tokens = unit-norm topic vector + noise; topic switches
    every ~200-600 tokens (drift → surprise spikes at real boundaries).
    Needles are distinctive unit directions with a mild salience boost
    (×1.3) so representative-token selection can see them, mirroring
    the attention-salience the real model provides."""
    topics = rng.standard_normal((N_TOPICS, DIM)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    keys = np.zeros((T, DIM), np.float32)
    t = 0
    while t < T:
        span = int(rng.integers(200, 600))
        topic = topics[rng.integers(N_TOPICS)]
        noise = 0.4 * rng.standard_normal((min(span, T - t), DIM))
        seg = topic[None, :] + noise.astype(np.float32)
        keys[t : t + len(seg)] = seg / np.linalg.norm(
            seg, axis=1, keepdims=True
        )
        t += len(seg)
    needles = rng.standard_normal((N_NEEDLES, DIM)).astype(np.float32)
    needles /= np.linalg.norm(needles, axis=1, keepdims=True)
    pos = rng.choice(np.arange(64, T - 64), size=N_NEEDLES, replace=False)
    for i, p in enumerate(pos):
        keys[p] = 1.3 * needles[i]
    return keys, needles, pos


def ingest(keys):
    """Chunked ingestion → (memory, event spans in add order)."""
    T, _ = keys.shape
    mem = EpisodicKVMemory(event_len=64, n_rep=4)
    spans_all = []
    Kh = keys.reshape(T, HEADS, DH)
    prev = keys[0]
    for c0 in range(0, T, CHUNK):
        chunk = keys[c0 : c0 + CHUNK]
        # deterministic surprise proxy: 1 − cos-sim to the previous token
        prevs = np.vstack([prev[None, :], chunk[:-1]])
        sur = 1.0 - np.sum(chunk * prevs, axis=1)
        prev = chunk[-1]
        spans = segment_events(chunk, sur, gamma=1.0, min_event=16,
                               refine_window=0)
        mem.add_events(Kh[c0 : c0 + CHUNK], Kh[c0 : c0 + CHUNK],
                       [(s, e) for s, e in spans])
        spans_all += [(c0 + s, c0 + e) for s, e in spans]
    return mem, spans_all


def main():
    out = {"config": {
        "dim": DIM, "chunk": CHUNK, "needles": N_NEEDLES,
        "event_budget": f"{EVENT_BUDGET_SIM} similarity + "
                        f"{EVENT_BUDGET_CONTIG} contiguity-neighbors",
        "seeds": list(STREAM_SEEDS),
    }, "rows": []}

    for T in LENGTHS:
        hits_em, hits_rec, hits_rnd, oracle_ok, kv_frac = [], [], [], [], []
        n_events_all = []
        for seed in STREAM_SEEDS:
            rng = np.random.default_rng(seed)
            keys, needles, pos = build_stream(rng, T)
            mem, spans = ingest(keys)
            n_events = len(spans)
            n_events_all.append(n_events)
            per_query_events = len(
                mem.retrieve(
                    needles[0].reshape(1, HEADS, DH),
                    k_sim=EVENT_BUDGET_SIM, k_contig=EVENT_BUDGET_CONTIG,
                )
            )
            for i in range(N_NEEDLES):
                q = needles[i].reshape(1, HEADS, DH)
                # full-attention oracle: argmax over every token key
                oracle = int(np.argmax(keys @ needles[i]))
                oracle_ok.append(oracle == pos[i])
                ev = mem.retrieve(q, k_sim=EVENT_BUDGET_SIM,
                                  k_contig=EVENT_BUDGET_CONTIG)
                hit = any(spans[e][0] <= pos[i] < spans[e][1] for e in ev)
                hits_em.append(hit)
                kv_frac.append(
                    sum(spans[e][1] - spans[e][0] for e in ev) / T
                )
                # recency baseline: same number of most-recent events
                rec = list(range(max(0, n_events - len(ev)), n_events))
                hits_rec.append(
                    any(spans[e][0] <= pos[i] < spans[e][1] for e in rec)
                )
                rnd = rng.choice(n_events, size=min(len(ev), n_events),
                                 replace=False)
                hits_rnd.append(
                    any(spans[e][0] <= pos[i] < spans[e][1] for e in rnd)
                )
        row = {
            "context_tokens": T,
            "n_events_mean": round(float(np.mean(n_events_all)), 1),
            "oracle_hit_rate": round(float(np.mean(oracle_ok)), 3),
            "emllm_hit_rate": round(float(np.mean(hits_em)), 3),
            "recency_hit_rate": round(float(np.mean(hits_rec)), 3),
            "random_hit_rate": round(float(np.mean(hits_rnd)), 3),
            "kv_fraction_moved": round(float(np.mean(kv_frac)), 4),
        }
        out["rows"].append(row)
        print(row, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "emllm_retrieval_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
