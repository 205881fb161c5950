"""SparsePO: token-masked DPO on synthetic preferences."""

import jax
import numpy as np

from hebo_tpu.po.sparsepo import (
    TinyLM, make_pref_data, preference_accuracy, train_sparse_po,
)


def test_sparse_po_learns_preferences():
    key = jax.random.PRNGKey(0)
    model = TinyLM(vocab=32, d_model=32, n_layers=1, max_len=16)
    chosen, rejected = make_pref_data(key, 64, 12, 32)
    params, metrics = train_sparse_po(
        model, key, chosen, rejected, n_steps=120, batch=16,
    )
    assert np.isfinite(metrics["loss"]).all()
    # optimization reduces the DPO loss
    assert metrics["loss"][-10:].mean() < metrics["loss"][:10].mean()
    acc = preference_accuracy(
        model, params, metrics["ref_params"], chosen, rejected
    )
    assert acc > 0.8
    # masks stay in (0,1) and the sparsity term keeps them below saturation
    assert 0.0 < metrics["mask_mean"][-1] < 1.0


def test_all_mask_flavors_train():
    """Every reference mask flavor (learned / all_layers / activation /
    common — src/masks/mask_models.py + the sparse & mapo trainers) trains
    to above-chance preference accuracy."""
    import jax

    from hebo_tpu.po.sparsepo import (
        TinyLM, make_pref_data, preference_accuracy, train_sparse_po)

    key = jax.random.PRNGKey(0)
    model = TinyLM(vocab=32, d_model=32, n_heads=2, n_layers=2, max_len=24)
    chosen, rejected = make_pref_data(key, 64, 24, 32)
    for mode in ("learned", "all_layers", "activation", "common"):
        params, info = train_sparse_po(
            model, jax.random.PRNGKey(1), chosen, rejected,
            n_steps=60, mask_mode=mode,
        )
        acc = preference_accuracy(
            model, params, info["ref_params"], chosen, rejected, mask_mode=mode
        )
        assert acc > 0.6, (mode, acc)
        assert info["loss"][-1] < info["loss"][0], mode
