"""SELFIES-style chem decoder + T-LBO weighted-retraining molecule BO.

Parity target: T-LBO chem task (weighted_retraining/.../chem/jtnn/) —
the robustness guarantee (every latent decodes valid) and the weighted
retraining loop, without the rdkit dependency (VERDICT r1 next-#8).
"""

import numpy as np
import pytest

from hebo_tpu.latent.chem import (
    ALPHABET,
    N_TOKENS,
    ChemLatentBO,
    canonical_string,
    decode_tokens,
    penalized_logp_proxy,
    random_molecules,
)


def test_every_token_stream_decodes_valid():
    rng = np.random.default_rng(3)
    for _ in range(200):
        toks = rng.integers(0, N_TOKENS, rng.integers(0, 48))
        g = decode_tokens(toks)
        assert len(g.atoms) >= 1
        for i in range(len(g.atoms)):
            assert g.free_valence(i) >= 0, (list(toks), g.atoms, g.bonds)
        # bond orders clipped into {1,2,3} and no duplicate bonds
        pairs = set()
        for a, b, o in g.bonds:
            assert 1 <= o <= 3 and a != b
            assert (a, b) not in pairs and (b, a) not in pairs
            pairs.add((a, b))


def test_canonical_string_dedupes_identical_graphs():
    t = np.asarray([1, 1, 2, 3])  # C C N O chain
    s1 = canonical_string(decode_tokens(t))
    s2 = canonical_string(decode_tokens(t.copy()))
    assert s1 == s2 and len(s1) > 0


def test_property_rewards_structure():
    chain = decode_tokens([1] * 10)  # carbon chain
    frag = decode_tokens([1, 0, 0, 1])  # 0 is nop -> still one chain
    assert penalized_logp_proxy(chain) > penalized_logp_proxy(decode_tokens([3] * 10))
    assert np.isfinite(penalized_logp_proxy(frag))


def test_random_molecules_shape_and_validity():
    toks = random_molecules(8, 16, seed=1)
    assert toks.shape == (8, 16)
    for t in toks:
        g = decode_tokens(t)
        assert all(g.free_valence(i) >= 0 for i in range(len(g.atoms)))


def test_chem_latent_bo_improves():
    bo = ChemLatentBO(n_init=48, vae_steps=60, retrain_every=3, seed=1,
                      seq_len=16, latent_dim=6)
    y0 = bo.best_y
    for _ in range(4):
        bo.step(batch=3)
    assert bo.best_y >= y0
    assert np.isfinite(bo.best_y)
    # molecules are deduplicated on canonical form
    strs = [canonical_string(decode_tokens(t)) for t in bo.tokens]
    n_init_dupes = len(strs) - len(set(strs))
    assert n_init_dupes <= len(bo.tokens) // 4  # BO additions are unique
