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
