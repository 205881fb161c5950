"""EM-LLM analog: segmentation, episodic retrieval, needle recall."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.emllm.attention import EMLLMAttention, masked_attention
from hebo_tpu.emllm.memory import EpisodicKVMemory, retrieve_sharded
from hebo_tpu.emllm.segmentation import segment_events, surprise_boundaries


def test_surprise_boundaries():
    s = np.ones(100) * 0.5
    s[[20, 55, 57, 80]] = 5.0
    b = surprise_boundaries(s, gamma=1.0, min_event=8)
    assert 20 in b and 55 in b and 80 in b
    assert 57 not in b  # min_event spacing


def test_segment_events_cover():
    rng = np.random.default_rng(0)
    keys = rng.standard_normal((120, 8)).astype(np.float32)
    s = rng.random(120)
    s[[30, 60, 90]] = 10.0
    spans = segment_events(keys, s, gamma=1.0, min_event=8)
    # spans cover [0, 120) without overlap
    assert spans[0][0] == 0 and spans[-1][1] == 120
    for (a, b), (c, d) in zip(spans[:-1], spans[1:]):
        assert b == c


def test_memory_retrieval_finds_needle():
    rng = np.random.default_rng(1)
    H, Dh = 2, 8
    mem = EpisodicKVMemory(event_len=16, n_rep=2)
    # 10 noise events + one needle event with a distinctive key direction
    needle_dir = np.zeros((H, Dh), np.float32)
    needle_dir[:, 0] = 10.0
    for i in range(10):
        K = rng.standard_normal((16, H, Dh)).astype(np.float32) * 0.1
        V = rng.standard_normal((16, H, Dh)).astype(np.float32)
        mem.add_events(K, V, [(0, 16)])
    K = np.repeat(needle_dir[None], 16, axis=0) + 0.01 * rng.standard_normal(
        (16, H, Dh)
    ).astype(np.float32)
    V = np.ones((16, H, Dh), np.float32)
    mem.add_events(K, V, [(0, 16)])
    q = needle_dir[None]  # (1, H, Dh)
    ids = mem.retrieve(q, k_sim=2, k_contig=0)
    assert 10 in ids  # the needle event wins the similarity stage


def test_em_attention_end_to_end_recall():
    rng = np.random.default_rng(2)
    H, Dh = 2, 8
    att = EMLLMAttention(H, Dh, local_window=32, event_len=16, k_sim=3)
    # stream 6 chunks of noise, then a distinctive chunk, then more noise
    needle_k = np.zeros((16, H, Dh), np.float32)
    needle_k[:, :, 1] = 8.0
    needle_v = np.full((16, H, Dh), 7.0, np.float32)
    for i in range(4):
        K = rng.standard_normal((32, H, Dh)).astype(np.float32) * 0.1
        V = rng.standard_normal((32, H, Dh)).astype(np.float32) * 0.1
        att.ingest(K, V, rng.random(32))
    s = np.ones(16) * 0.1
    s[0] = 10.0  # boundary at the needle
    att.ingest(needle_k, needle_v, s)
    for i in range(4):
        K = rng.standard_normal((32, H, Dh)).astype(np.float32) * 0.1
        V = rng.standard_normal((32, H, Dh)).astype(np.float32) * 0.1
        att.ingest(K, V, rng.random(32))
    # query along the needle direction: output should recall value ≈ 7
    Q = np.zeros((1, H, Dh), np.float32)
    Q[:, :, 1] = 8.0
    out = att.attend(Q)
    assert out.shape == (1, H, Dh)
    assert np.mean(out) > 3.0  # dominated by the needle value


def test_retrieve_sharded_matches_host():
    rng = np.random.default_rng(3)
    E, F = 32, 16
    reps = jnp.asarray(rng.standard_normal((E, F)), jnp.float32)
    q = jnp.asarray(rng.standard_normal(F), jnp.float32)
    from hebo_tpu.parallel.sharded import make_mesh

    mesh = make_mesh(min(4, len(jax.devices())), axis="mem")
    got = np.sort(np.asarray(retrieve_sharded(mesh, reps, q, k_sim=4, axis="mem")))
    want = np.sort(np.argsort(-np.asarray(reps @ q))[:4])
    np.testing.assert_array_equal(got, want)
