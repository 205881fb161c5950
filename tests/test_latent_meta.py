"""T-LBO latent BO + NAP neural-process tests."""

import numpy as np
import pytest

from hebo_tpu import DesignSpace


CONT8 = [
    {"name": f"x{i}", "type": "num", "lb": -1, "ub": 1} for i in range(8)
]


def test_rank_weights():
    from hebo_tpu.latent.vae import rank_weights

    y = np.array([3.0, 1.0, 2.0])
    w = rank_weights(y, k=1e-3)
    assert w[1] > w[2] > w[0]  # best gets most weight
    assert abs(w.sum() - 3.0) < 1e-9


def test_latent_bo_runs():
    from hebo_tpu.latent.lbo import LatentSpaceBO

    space = DesignSpace(CONT8)

    def f(df):
        X = df.values.astype(float)
        return np.sum(X[:, :2] ** 2, axis=1, keepdims=True)

    opt = LatentSpaceBO(
        space, latent_dim=3, retrain_every=6, n_init=6,
        vae_steps=50, model_config={"num_epochs": 8},
    )
    for _ in range(6):
        rec = opt.suggest(3)
        assert rec.shape == (3, 8)
        opt.observe(rec, f(rec))
    assert np.isfinite(opt.best_y)
    assert opt._n_retrains >= 1


def test_latent_bo_categorical_sequences():
    from hebo_tpu.latent.lbo import LatentSpaceBO

    space = DesignSpace(
        [{"name": f"c{i}", "type": "cat", "categories": list("abcd")} for i in range(6)]
    )

    def f(df):
        return -np.stack(
            [(df[f"c{i}"].values == "a") for i in range(6)]
        ).sum(axis=0).astype(float).reshape(-1, 1)

    opt = LatentSpaceBO(
        space, latent_dim=3, retrain_every=6, n_init=6,
        vae_steps=50, model_config={"num_epochs": 8},
    )
    for _ in range(4):
        rec = opt.suggest(2)
        opt.observe(rec, f(rec))
    assert np.isfinite(opt.best_y)


def test_nap_surrogate_predicts():
    from hebo_tpu.meta.nap import NAPSurrogate

    space = DesignSpace(CONT8[:2])
    surr = NAPSurrogate(space, meta_steps=100, d_model=32, n_layers=2)
    rng = np.random.default_rng(0)
    X = space.transform(space.sample(20, seed=0))
    y = np.sum(X**2, axis=1, keepdims=True)
    surr.fit(X, y)
    mu, var = surr.predict(X)
    assert mu.shape == (20, 1) and np.all(var > 0)
    assert np.all(np.isfinite(mu))
    # contract: short meta-training gives a sane (not yet sharp) predictor;
    # production use needs meta_steps in the tens of thousands (PFN-scale)
    assert np.sqrt(np.mean((mu - y) ** 2)) < 3.0 * np.std(y)


def test_nap_in_bo_loop():
    from hebo_tpu.meta.nap import NAPSurrogate  # noqa: F401 (registers 'nap')
    from hebo_tpu.optimizers.bo_builder import BoBuilder, MODEL_REGISTRY_MAP

    MODEL_REGISTRY_MAP.setdefault("nap", ("nap", {}))
    space = DesignSpace(CONT8[:2])
    opt = BoBuilder(
        "nap", "rs", "ei", "none",
        model_kwargs={"meta_steps": 100, "d_model": 32, "n_layers": 2},
    ).build_bo(space, n_init=4)

    def f(df):
        X = df.values.astype(float)
        return np.sum(X**2, axis=1, keepdims=True)

    for _ in range(4):
        rec = opt.suggest(2)
        opt.observe(rec, f(rec))
    assert np.isfinite(opt.best_y)


def test_filter_action_logits_topk_topp():
    import jax.numpy as jnp

    from hebo_tpu.meta.ppo import filter_action_logits

    logits = jnp.array([[0.0, 1.0, 2.0, 3.0, -1.0]])
    out_k = filter_action_logits(logits, top_k=2)
    kept = np.asarray(out_k[0] > -1e8)
    assert kept.tolist() == [False, False, True, True, False]

    # top_p keeps the smallest prefix of the sorted distribution >= p —
    # the argmax always survives
    out_p = filter_action_logits(logits, top_p=0.5)
    kept_p = np.asarray(out_p[0] > -1e8)
    assert kept_p[3]  # argmax kept
    assert kept_p.sum() < 5  # something was filtered
    # disabled filters are the identity
    out_id = filter_action_logits(logits, top_k=0, top_p=1.0)
    assert np.allclose(np.asarray(out_id), np.asarray(logits))


def test_latent_bo_semi_supervised():
    from hebo_tpu.latent.lbo import LatentSpaceBO

    space = DesignSpace(CONT8)

    def f(df):
        X = df.values.astype(float)
        return np.sum(X[:, :2] ** 2, axis=1, keepdims=True)

    opt = LatentSpaceBO(
        space, latent_dim=3, retrain_every=6, n_init=6,
        vae_steps=50, model_config={"num_epochs": 8},
    )
    # unlabeled pool: 32 structures the black box never scored
    opt.add_unlabeled(space.sample(32, seed=7))
    assert opt._unlabeled.shape == (32, 8)
    for _ in range(5):
        rec = opt.suggest(3)
        assert rec.shape == (3, 8)
        opt.observe(rec, f(rec))
    assert opt._n_retrains >= 1
    assert np.isfinite(opt.best_y)


def test_nap_mixed_space():
    from hebo_tpu.meta.nap import NAPSurrogate

    space = DesignSpace(
        [
            {"name": "x0", "type": "num", "lb": -1, "ub": 1},
            {"name": "c0", "type": "cat", "categories": ["a", "b", "c"]},
        ]
    )
    surr = NAPSurrogate(space, meta_steps=80, d_model=32, n_layers=2)
    assert surr.model.cat_dims  # mixed-type path active
    X = space.transform(space.sample(16, seed=0))
    y = (X[:, :1].astype(float)) ** 2 + 0.5 * (X[:, 1:2] == 1)
    surr.fit(X, y)
    mu, var = surr.predict(X)
    assert mu.shape == (16, 1) and np.all(np.isfinite(mu)) and np.all(var > 0)


def test_nap_meta_training_reduces_loss():
    import jax

    from hebo_tpu.meta.nap import TransformerNP, meta_train_np

    model = TransformerNP(dim_x=2, d_model=32, n_layers=2)
    _, losses = meta_train_np(model, jax.random.PRNGKey(0), n_steps=150)
    # the PFN objective must actually descend (regression guard for the
    # stale-params closure bug where gradients were identically zero)
    assert np.mean(losses[-25:]) < np.mean(losses[:25]) - 0.05
