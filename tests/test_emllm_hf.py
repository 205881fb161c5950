"""EM-LLM driving a real HF causal LM (hermetic random-weight GPT-2).

Parity: EM-LLM's integration with actual transformer LMs
(EM-LLM/em_llm/em_llm.py) — chunked prefill, model-surprise segmentation,
per-layer episodic KV memory, retrieval injected through the KV cache.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(n_layer=2, n_head=4, n_embd=64, vocab_size=128,
                     n_positions=512)
    return GPT2LMHeadModel(cfg)


def test_runner_streams_long_context(tiny_gpt2):
    from hebo_tpu.emllm.hf_integration import EMLLMRunner

    run = EMLLMRunner(tiny_gpt2, chunk_size=48, event_len=24)
    ids = np.random.default_rng(0).integers(0, 128, 300)
    out = run.process(ids)
    assert np.all(np.isfinite(out["nll_per_token"]))
    assert len(out["nll_per_token"]) == 300 - int(np.ceil(300 / 48))
    assert out["n_events"] > 0
    # retrieval kicks in after the first chunk populates the memory
    assert out["retrieved_per_chunk"][0] == 0
    assert any(r > 0 for r in out["retrieved_per_chunk"][1:])


def test_memory_grows_per_layer(tiny_gpt2):
    from hebo_tpu.emllm.hf_integration import EMLLMRunner

    run = EMLLMRunner(tiny_gpt2, chunk_size=32, event_len=16)
    ids = np.random.default_rng(1).integers(0, 128, 160)
    run.process(ids)
    # every layer keeps its own episodic store with identical event count
    counts = [len(m) for m in run.memories]
    assert len(set(counts)) == 1 and counts[0] > 0


def test_retrieval_changes_predictions(tiny_gpt2):
    """Injected KV must actually influence the logits: compare the NLL of
    a repeated pattern with and without memory retrieval enabled."""
    from hebo_tpu.emllm.hf_integration import EMLLMRunner

    rng = np.random.default_rng(2)
    pattern = rng.integers(0, 128, 64)
    ids = np.concatenate([pattern, pattern, pattern])
    with_mem = EMLLMRunner(tiny_gpt2, chunk_size=64, event_len=32,
                           n_retrieve=3, n_contig=1)
    out_mem = with_mem.process(ids)
    no_mem = EMLLMRunner(tiny_gpt2, chunk_size=64, event_len=32,
                         n_retrieve=0, n_contig=0)
    out_no = no_mem.process(ids)
    # both finite; with retrieval the later-chunk predictions differ
    a = out_mem["nll_per_token"][-60:]
    b = out_no["nll_per_token"][-60:]
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    assert not np.allclose(a, b)
