"""T-LBO task-VAE families: topology conv VAE + autoregressive sequence VAE
(reference: T-LBO weighted_retraining task VAEs, models.py:18-486;
robust_opt_topology.py; chem/jtnn sequential decoding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebo_tpu.latent import (
    ImageLatentBO, SeqVAE, TopologyVAE, rank_weights, seq_decode, seq_encode,
    topology_decode, topology_encode, train_seq_vae, train_topology_vae,
)


def _topo_data(n=16, hw=(24, 24), seed=0):
    rng = np.random.default_rng(seed)
    X = (rng.random((n,) + hw + (1,)) < 0.3).astype(np.float32)
    y = X.mean(axis=(1, 2, 3)).reshape(-1, 1).astype(np.float32)
    return X, y


def test_topology_vae_trains_and_roundtrips():
    hw = (24, 24)
    X, y = _topo_data(hw=hw)
    vae = TopologyVAE(latent_dim=4, image_hw=hw, width=8)
    key = jax.random.PRNGKey(0)
    params = vae.init({"params": key}, jnp.zeros((1,) + hw + (1,)), key)["params"]
    w = rank_weights(y[:, 0])
    params, losses = train_topology_vae(
        vae, params, key, jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(w, jnp.float32), n_steps=25,
    )
    assert float(losses[-1]) < float(losses[0])
    Z = topology_encode(vae, params, X)
    assert Z.shape == (len(X), 4)
    imgs = topology_decode(vae, params, Z[:3])
    assert imgs.shape == (3,) + hw + (1,)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_topology_vae_odd_image_size_cropped():
    hw = (25, 25)  # not a multiple of 8 — decoder must crop
    vae = TopologyVAE(latent_dim=3, image_hw=hw, width=8)
    key = jax.random.PRNGKey(1)
    params = vae.init({"params": key}, jnp.zeros((1,) + hw + (1,)), key)["params"]
    imgs = topology_decode(vae, params, np.zeros((2, 3), np.float32))
    assert imgs.shape == (2,) + hw + (1,)


def test_seq_vae_trains_and_decodes_valid_tokens():
    V, L = 6, 10
    rng = np.random.default_rng(2)
    toks = rng.integers(0, V, (32, L)).astype(np.int32)
    y = toks.mean(axis=1, keepdims=True).astype(np.float32)
    vae = SeqVAE(vocab=V, length=L, latent_dim=4, hidden=24)
    key = jax.random.PRNGKey(0)
    params = vae.init({"params": key}, jnp.asarray(toks[:1]), key)["params"]
    w = rank_weights(y[:, 0])
    params, losses = train_seq_vae(
        vae, params, key, jnp.asarray(toks), jnp.asarray(y),
        jnp.asarray(w, jnp.float32), n_steps=25,
    )
    assert float(losses[-1]) < float(losses[0])
    Z = seq_encode(vae, params, toks)
    out = seq_decode(vae, params, Z[:5])
    assert out.shape == (5, L)
    assert out.min() >= 0 and out.max() < V


def test_padded_rows_do_not_change_gradients():
    # zero-weight padding must be invisible to training (bucket invariance)
    hw = (16, 16)
    X, y = _topo_data(n=8, hw=hw, seed=3)
    vae = TopologyVAE(latent_dim=3, image_hw=hw, width=8)
    key = jax.random.PRNGKey(0)
    params = vae.init({"params": key}, jnp.zeros((1,) + hw + (1,)), key)["params"]
    w = rank_weights(y[:, 0])

    p1, l1 = train_topology_vae(
        vae, params, key, jnp.asarray(X), jnp.asarray(y),
        jnp.asarray(w, jnp.float32), n_steps=5,
    )
    Xp = np.concatenate([X, np.zeros((4,) + hw + (1,), np.float32)])
    yp = np.concatenate([y, np.zeros((4, 1), np.float32)])
    wp = np.concatenate([w, np.zeros(4)]).astype(np.float32)
    p2, l2 = train_topology_vae(
        vae, params, key, jnp.asarray(Xp), jnp.asarray(yp),
        jnp.asarray(wp), n_steps=5,
    )
    # same data, different padding: losses differ by the mean-normalization
    # constant only, so the latent encodings should be close
    Z1 = topology_encode(vae, p1, X)
    Z2 = topology_encode(vae, p2, X)
    assert np.allclose(Z1, Z2, atol=0.3)


def test_image_latent_bo_smoke():
    H = W = 16
    target = np.zeros((H, W), np.float32)
    target[6:10, :] = 1.0

    def score(imgs):
        b = (imgs[..., 0] > 0.5).astype(np.float32)
        return np.mean((b - target[None]) ** 2, axis=(1, 2)).reshape(-1, 1)

    bo = ImageLatentBO(image_hw=(H, W), latent_dim=4, vae_steps=20,
                       retrain_every=3, model_config={"num_epochs": 10})
    ys = []
    for _ in range(8):
        imgs = bo.suggest(2)
        assert imgs.shape == (2, H, W, 1)
        y = score(imgs)
        bo.observe(imgs, y)
        ys.extend(y[:, 0].tolist())
    assert np.all(np.isfinite(ys))
