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
