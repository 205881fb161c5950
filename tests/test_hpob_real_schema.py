"""HPO-B real-schema loader + NAP-shape eval harness (VERDICT r1 next-#9).

The fixture reproduces the exact meta-dataset layout consumed by
NAP/HPOB_data/convertHPOB.py (y as [[acc], ...] in [0,1]); the harness
output is checked against the schema of NAP/results/HPO-B/NAP.json
({space: {dataset: {"testN": [best-so-far acc...]}}}).
"""

import json

import numpy as np
import pytest

from hebo_tpu.tasks.hpob import (
    TabularBenchmark,
    load_meta_dataset,
    run_hpob_eval,
)


@pytest.fixture()
def meta_dataset_file(tmp_path):
    """Real HPO-B meta-dataset layout: two spaces, y = [[acc],...]"""
    rng = np.random.default_rng(0)

    def make_entry(n, d, seed):
        r = np.random.default_rng(seed)
        X = r.random((n, d)).tolist()
        y = [[float(v)] for v in np.clip(r.beta(5, 2, n), 0, 1)]
        return {"X": X, "y": y}

    data = {
        "5860": {"14965": make_entry(64, 3, 1), "9976": make_entry(48, 3, 2)},
        "5906": {"3493": make_entry(32, 8, 3)},
    }
    p = tmp_path / "meta-test-dataset.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_load_json_real_schema(meta_dataset_file):
    b = TabularBenchmark.load_json(meta_dataset_file, "5860", "14965")
    assert b.X_table.shape == (64, 3)
    assert b.y_table.shape == (64,)
    assert 0.0 <= b.y_table.min() and b.y_table.max() <= 1.0
    # snapping: querying a table row returns its own accuracy
    import pandas as pd

    df = pd.DataFrame(b.X_table[:4], columns=b.param_names)
    y = b(df)
    np.testing.assert_allclose(y[:, 0], b.y_table[:4])


def test_load_meta_dataset_full(meta_dataset_file):
    suite = load_meta_dataset(meta_dataset_file)
    assert set(suite) == {"5860", "5906"}
    assert set(suite["5860"]) == {"14965", "9976"}
    assert suite["5906"]["3493"].X_table.shape[1] == 8


def test_run_hpob_eval_emits_reference_schema(meta_dataset_file):
    suite = load_meta_dataset(meta_dataset_file)
    # small budgets: 2 seeds x 8 trials on one space
    results = run_hpob_eval(
        {"5860": suite["5860"]}, n_seeds=2, n_trials=8, n_init=3
    )
    # exact reference shape: {space: {dataset: {"testN": [...]}}}
    assert set(results) == {"5860"}
    for ds, traces in results["5860"].items():
        assert set(traces) == {"test0", "test1"}
        for t in traces.values():
            assert len(t) == 8
            assert all(0.0 <= v <= 1.0 for v in t)
            assert all(b >= a - 1e-12 for a, b in zip(t, t[1:]))  # monotone
    # round-trips through json like the reference artifact
    s = json.dumps(results)
    assert json.loads(s) == results


def test_eval_against_reference_trace_format():
    """The harness output can be merged/compared with a reference-format
    trace file (normalized-regret comparison, NAP README.md:29-31)."""
    ref = {"5860": {"14965": {"test0": [0.9, 0.95, 1.0], "test1": [0.8, 0.9, 1.0]}}}
    ours = {"5860": {"14965": {"test0": [0.85, 0.97, 0.99]}}}
    # per-step mean best-so-far comparison
    r = np.mean([ref["5860"]["14965"][k] for k in ref["5860"]["14965"]], axis=0)
    o = np.mean([ours["5860"]["14965"][k] for k in ours["5860"]["14965"]], axis=0)
    assert r.shape == o.shape == (3,)
