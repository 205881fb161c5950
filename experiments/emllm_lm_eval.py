"""EM-LLM through a REAL (locally trained) language model (VERDICT r3 #3).

The r3 eval scored retrieval on synthetic embeddings; this one measures
answer accuracy through a real model's attention states end to end:

1. Train a tiny GPT-2 (2 layers, d=64, 324-token vocab) from scratch on
   deterministic synthetic key-value text: sequences of facts
   ``k v SEP`` (single-token keys/values) followed by a query
   ``QUERY k ARROW`` whose answer is the fact's value token — the
   textbook induction-head task (match the key, copy its successor).
2. Build 32k/65k/131k-token streams of filler facts with ONE needle fact
   (key drawn from a range excluded from fillers), stream them through
   ``EMLLMRunner`` (surprise segmentation → episodic KV → two-stage
   retrieval scored with the model's own attention-query projections),
   and greedy-decode the answer after the query.
3. Report exact-match answer accuracy vs (a) the needle-in-window ORACLE
   (needle + query inside one native 512-token window — the skyline for
   this model) and (b) the last-window-only truncation baseline (needle
   unseen — floor).  A full-attention oracle at 131k is impossible for a
   512-position model; the in-window oracle is the honest skyline
   (reference QA harness: EM-LLM/benchmark/eval.py).

Appends a ``model_based`` block to emllm_retrieval_eval.json.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
        python experiments/emllm_lm_eval.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ---- vocabulary ----------------------------------------------------------
# digits 0..9 at ids 0..9; markers; then a 44-symbol key alphabet.  Keys
# are TWO key-alphabet tokens (1936 combos) — matchable by a 2-3 layer
# induction circuit; needle keys use a reserved first symbol excluded
# from fillers, so the queried fact is unique in the stream.
QUERY, ARROW, SEP, BOS = 0, 1, 2, 3
K0, K_N = 4, 256      # key tokens
V0, V_N = 260, 64     # value tokens
VOCAB = V0 + V_N
N_RESERVED = 8        # keys K0..K0+7 are needle-only (unique in streams)
FACT_LEN = 3          # k v SEP — textbook induction: match the key
                      # token, copy the token after it
SEQ_LEN = 256
N_POSITIONS = 1024
N_FACTS_TRAIN = (SEQ_LEN - 6) // FACT_LEN

N_EPISODES = int(os.environ.get("EMLLM_EPISODES", 8))
LENGTHS = tuple(int(v) for v in os.environ.get(
    "EMLLM_LENGTHS", "32768,65536,131072").split(","))
MAX_STEPS = int(os.environ.get("EMLLM_TRAIN_STEPS", 80000))
CHUNK = 256


def digits(v, n):
    return [int(c) for c in str(v).zfill(n)]


def make_fact(k, val):
    return [K0 + int(k), V0 + int(val), SEP]


def make_query(k):
    # answer is predicted AT the key position (pure induction: the value
    # followed this key before); no ARROW indirection
    return [QUERY, K0 + int(k)]


def sample_keys(rng, n, reserved=False):
    """Distinct (k1, k2) pairs; fillers never use reserved first symbols."""
    lo = 0 if reserved else N_RESERVED
    k1 = rng.integers(lo if reserved else N_RESERVED, KA_N, size=n)
    if reserved:
        k1 = rng.integers(0, N_RESERVED, size=n)
    k2 = rng.integers(0, KA_N, size=n)
    return k1, k2


def train_batch(rng, batch):
    """Sequences + label mask: loss ONLY on the 3 answer digits (the
    filler values are unlearnable noise; masking focuses every gradient
    on the lookup task)."""
    xs, lbl = [], []
    for _ in range(batch):
        # in-context REPEATED facts: each key appears ~3x per sequence
        # (same key → same value), so the plain LM loss on repeated
        # values rewards the induction circuit densely (a single
        # end-of-sequence query gave it nothing to form on — the
        # distinct-key variants plateaued at chance; the pure-copy
        # ablation confirmed the architecture forms induction), plus
        # THREE query/answer pairs per sequence.
        n_facts = N_FACTS_TRAIN - 3
        pool = rng.choice(K_N, size=max(2, n_facts // 3), replace=False)
        pool_vals = rng.integers(0, V_N, size=len(pool))
        slots = rng.integers(0, len(pool), size=n_facts)
        toks = [BOS]
        for si in slots:
            toks.extend(make_fact(int(pool[si]), int(pool_vals[si])))
        ans_pos = []
        for _q in range(3):
            qi = int(slots[rng.integers(0, n_facts)])
            toks.extend(make_query(int(pool[qi])))
            ans_pos.append(len(toks))
            toks.append(V0 + int(pool_vals[qi]))
        toks = toks[:SEQ_LEN]
        pad = SEQ_LEN - len(toks)
        xs.append(toks + [SEP] * pad)
        m = [-100] * SEQ_LEN
        for ap in ans_pos:
            if ap < SEQ_LEN:
                m[ap] = toks[ap]
        lbl.append(m)
    return np.asarray(xs), np.asarray(lbl)


def train_model_flax():
    """Train on the TPU with FlaxGPT2 (same config/objective as the torch
    path), then convert weights to torch for the EMLLMRunner eval.  The
    2-CPU host cannot drive enough steps for induction-circuit formation
    (overfit test passes — the loop is correct — but 1500 steps at batch
    24 stays at chance); the chip runs 20k steps in minutes."""
    import jax
    import jax.numpy as jnp
    import optax
    from transformers import FlaxGPT2LMHeadModel, GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=VOCAB, n_positions=N_POSITIONS, n_embd=128, n_layer=3,
        n_head=4, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    fmodel = FlaxGPT2LMHeadModel(cfg, seed=0)
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "emllm_ckpt")
    if os.path.exists(os.path.join(ckpt, "flax_model.msgpack")):
        # reuse the trained checkpoint (training is deterministic)
        from transformers.modeling_flax_pytorch_utils import (
            load_flax_weights_in_pytorch_model,
        )
        from transformers import GPT2LMHeadModel as _T

        fmodel = FlaxGPT2LMHeadModel.from_pretrained(ckpt)
        model = _T(cfg)
        model = load_flax_weights_in_pytorch_model(
            model, fmodel.params
        ).eval()
        rng_e = np.random.default_rng(123)
        acc = eval_in_window(model, rng_e, 25)
        print(f"loaded checkpoint; in-window oracle acc {acc:.2f}",
              flush=True)
        return model, acc, 0.0, 0
    params = fmodel.params
    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, 6e-4, 2000, MAX_STEPS, 1e-4
        ),
        weight_decay=0.01,
    )
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)

    @jax.jit
    def step_fn(params, opt_state, x, labels, pos):
        def loss_fn(p):
            logits = fmodel(input_ids=x, position_ids=pos, params=p).logits
            lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = x[:, 1:]
            ce_all = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
            ce = jnp.mean(ce_all)
            lsh = labels[:, 1:]
            m = (lsh != -100).astype(jnp.float32)
            tgt_a = jnp.maximum(lsh, 0)
            ce_tok = -jnp.take_along_axis(lp, tgt_a[..., None], axis=-1)[..., 0]
            ce_ans = jnp.sum(ce_tok * m) / jnp.maximum(jnp.sum(m), 1.0)
            return ce + 5.0 * ce_ans, (ce, ce_ans)

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, up)
        return params, opt_state, aux

    BATCH = 64
    t0 = time.time()
    ce = ce_ans = None
    for step in range(MAX_STEPS):
        xs, lbl = train_batch(rng, BATCH)
        # positions start at 0 (the runner restarts positions per chunk)
        pos = np.broadcast_to(np.arange(SEQ_LEN)[None], xs.shape).copy()
        params, opt_state, (ce, ce_ans) = step_fn(
            params, opt_state, jnp.asarray(xs), jnp.asarray(lbl),
            jnp.asarray(pos),
        )
        if (step + 1) % 5000 == 0:
            print(f"step {step+1}: lm {float(ce):.3f} ans "
                  f"{float(ce_ans):.3f} ({time.time()-t0:.0f}s)", flush=True)
            if float(ce_ans) < 0.3:
                break
    # convert to torch for the (torch-driven) EMLLMRunner — direct
    # weight conversion (from_pretrained(from_flax=True) left the torch
    # model on meta tensors in this transformers version)
    from transformers.modeling_flax_pytorch_utils import (
        load_flax_weights_in_pytorch_model,
    )

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "emllm_ckpt")
    fmodel.params = params
    fmodel.save_pretrained(ckpt)
    model = GPT2LMHeadModel(cfg)
    model = load_flax_weights_in_pytorch_model(model, params).eval()
    rng_e = np.random.default_rng(123)
    acc = eval_in_window(model, rng_e, 25)
    print(f"converted to torch; in-window oracle acc {acc:.2f}", flush=True)
    return model, acc, time.time() - t0, step + 1


def train_model():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=VOCAB, n_positions=N_POSITIONS, n_embd=64, n_layer=2,
        n_head=2, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = GPT2LMHeadModel(cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    t0 = time.time()
    acc = 0.0
    for step in range(MAX_STEPS):
        xs, lbl = train_batch(rng, 24)
        x = torch.tensor(xs, dtype=torch.long)
        labels = torch.tensor(lbl, dtype=torch.long)
        # random position offset: eval feeds retrieved-KV prefixes, so
        # positions up to ~700 must be trained (n_positions 1024)
        off = int(rng.integers(0, N_POSITIONS - SEQ_LEN))
        pos = torch.arange(off, off + SEQ_LEN)[None].expand(x.shape[0], -1)
        out = model(x, position_ids=pos)
        # combined objective: full-LM loss forms the previous-token /
        # induction circuitry (answer-only loss alone leaves the trunk
        # with no pressure to represent structure — it plateaued at the
        # uniform-digit 2.3 nats); the answer tokens get 5x weight
        logits = out.logits[:, :-1].reshape(-1, VOCAB)
        tgt_all = x[:, 1:].reshape(-1)
        ce = torch.nn.functional.cross_entropy(logits, tgt_all)
        lbl_sh = labels[:, 1:].reshape(-1)
        ans_mask = lbl_sh != -100
        ce_ans = torch.nn.functional.cross_entropy(
            logits[ans_mask], lbl_sh[ans_mask]
        )
        loss = ce + 5.0 * ce_ans
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (step + 1) % 250 == 0:
            acc = eval_in_window(model, rng, 25)
            print(f"step {step+1}: lm {float(ce):.3f} ans "
                  f"{float(ce_ans):.3f} "
                  f"in-window answer acc {acc:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            if acc >= 0.95:
                break
    return model, acc, time.time() - t0, step + 1


def greedy_answer(model, toks, n_new=1):
    import torch

    with torch.no_grad():
        x = torch.tensor([toks], dtype=torch.long)
        out = model(x, use_cache=True)
        ans = []
        for _ in range(n_new):
            t = int(out.logits[0, -1].argmax())
            ans.append(t)
            out = model(
                torch.tensor([[t]], dtype=torch.long),
                past_key_values=out.past_key_values,
                use_cache=True,
            )
    return ans


def eval_in_window(model, rng, n_ep):
    """Oracle skyline: needle + query inside one native window."""
    hits = 0
    for _ in range(n_ep):
        # match the training distribution: filler keys repeat ~3x and
        # the needle (reserved key) appears twice
        n_facts = N_FACTS_TRAIN - 3
        pool = rng.choice(np.arange(N_RESERVED, K_N),
                          size=max(2, n_facts // 3), replace=False)
        pool_vals = rng.integers(0, V_N, size=len(pool))
        slots = rng.integers(0, len(pool), size=n_facts)
        nk = int(rng.integers(0, N_RESERVED))
        nval = int(rng.integers(0, V_N))
        npos = sorted(rng.choice(n_facts, size=2, replace=False))
        toks = [BOS]
        for i, si in enumerate(slots):
            if i in npos:
                toks.extend(make_fact(nk, nval))
            else:
                toks.extend(make_fact(int(pool[si]), int(pool_vals[si])))
        toks.extend(make_query(nk))
        ans = greedy_answer(model, toks[: SEQ_LEN - 1])
        hits += int(ans == [V0 + nval])
    return hits / n_ep


def episode_stream(rng, total_len):
    """Filler facts (non-reserved first key symbol) + ONE needle with a
    reserved first symbol (unique by construction) placed in the first
    half (genuinely long-range), + final query."""
    n_facts = (total_len - 12) // FACT_LEN
    # training-distribution fillers: keys repeat ~3x WITHIN each local
    # 256-token window (the model's lookup was trained on in-window
    # repetition); the needle appears twice, far from the query
    per_win = SEQ_LEN // FACT_LEN
    keys = np.empty(n_facts, np.int64)
    vals = np.empty(n_facts, np.int64)
    for w0 in range(0, n_facts, per_win):
        w = min(per_win, n_facts - w0)
        pool = rng.choice(np.arange(N_RESERVED, K_N),
                          size=max(2, w // 3), replace=False)
        pv = rng.integers(0, V_N, size=len(pool))
        si = rng.integers(0, len(pool), size=w)
        keys[w0:w0 + w] = pool[si]
        vals[w0:w0 + w] = pv[si]
    nk = int(rng.integers(0, N_RESERVED))
    needle_val = int(rng.integers(0, V_N))
    npos = sorted(rng.choice(n_facts // 2, size=2, replace=False))
    toks = [BOS]
    for i, (a, v) in enumerate(zip(keys, vals)):
        if i in npos:
            toks.extend(make_fact(nk, needle_val))
        else:
            toks.extend(make_fact(int(a), int(v)))
    return (
        np.asarray(toks, np.int64),
        np.asarray(make_query(nk), np.int64),
        [V0 + needle_val],
    )


def main():
    from hebo_tpu.emllm.hf_integration import EMLLMRunner

    import jax as _jax

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "emllm_ckpt", "flax_model.msgpack")
    if _jax.default_backend() == "tpu" or os.path.exists(ckpt):
        # fresh TPU training, or reuse of the persisted chip-trained
        # checkpoint on any backend
        model, train_acc, t_train, steps = train_model_flax()
    else:
        model, train_acc, t_train, steps = train_model()
    print(f"trained {steps} steps in {t_train:.0f}s; "
          f"in-window oracle acc {train_acc:.2f}", flush=True)

    rows = []
    for L in LENGTHS:
        rng = np.random.default_rng(100 + L)
        em_hits = trunc_hits = 0
        t0 = time.time()
        for ep in range(N_EPISODES):
            ctx, query, answer = episode_stream(rng, L)
            runner = EMLLMRunner(
                model, chunk_size=CHUNK, n_retrieve=4, n_contig=1,
                event_len=16,
            )
            runner.process(ctx)
            # query positions at end-of-window, matching training
            ans = runner.generate(
                query, 1, pos0=SEQ_LEN - len(query) - 2
            )
            em_hits += int(ans == answer)
            # truncation floor: last native window only, no memory
            tail = list(ctx[-(SEQ_LEN - len(query) - 1):]) + list(query)
            ans_t = greedy_answer(model, tail)
            trunc_hits += int(ans_t == answer)
        # oracle skyline on fresh same-rng episodes
        oracle = eval_in_window(model, rng, N_EPISODES)
        rows.append({
            "tokens": L,
            "episodes": N_EPISODES,
            "emllm_answer_acc": round(em_hits / N_EPISODES, 3),
            "truncation_answer_acc": round(trunc_hits / N_EPISODES, 3),
            "in_window_oracle_acc": round(oracle, 3),
            "wall_s": round(time.time() - t0, 1),
        })
        print(rows[-1], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "emllm_retrieval_eval.json")
    with open(path) as f:
        out = json.load(f)
    out["model_based"] = {
        "note": (
            "REAL attention states: tiny GPT-2 (2L, d64, vocab 16) trained "
            "in-repo on deterministic synthetic key-value text; EM-LLM "
            "streams the long context (surprise segmentation, episodic KV, "
            "attention-query-scored retrieval) and greedy-decodes the "
            "answer.  Oracle = needle+query inside one native 512-token "
            "window (full attention at 131k impossible for a 512-position "
            "model); truncation = last window only."
        ),
        "train": {
            "steps": steps, "train_wall_s": round(t_train, 1),
            "in_window_oracle_acc_at_train_end": round(train_acc, 3),
        },
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
