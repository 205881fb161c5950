"""Design-space round-trip and contract tests.

Mirrors reference HEBO/test/test_design_space.py style: transform ∘
inverse_transform identity, bounds, sampling validity, per-type checks.
"""

import numpy as np
import pandas as pd
import pytest

from hebo_tpu import DesignSpace

MIXED_SPEC = [
    {"name": "n", "type": "num", "lb": -2.0, "ub": 2.0},
    {"name": "p", "type": "pow", "lb": 1e-4, "ub": 1.0},
    {"name": "i", "type": "int", "lb": 0, "ub": 7},
    {"name": "pi", "type": "pow_int", "lb": 1, "ub": 1024},
    {"name": "ie", "type": "int_exponent", "lb": 16, "ub": 1024, "base": 2},
    {"name": "si", "type": "step_int", "lb": 10, "ub": 50, "step": 10},
    {"name": "b", "type": "bool"},
    {"name": "c", "type": "cat", "categories": ["red", "green", "blue"]},
    {"name": "o", "type": "ordinal", "categories": [1, 2, 5]},
]


def test_parse_and_dims():
    sp = DesignSpace(MIXED_SPEC)
    assert sp.num_params == 9
    assert sp.num_cols == 9
    assert len(sp.cat_dims) == 1
    assert len(sp.numeric_dims) == 8  # ordinal counts as numeric path
    assert sp.opt_lb.shape == (9,)
    assert np.all(sp.opt_lb <= sp.opt_ub)


def test_transform_roundtrip():
    sp = DesignSpace(MIXED_SPEC)
    df = sp.sample(32, seed=0)
    X = sp.transform(df)
    df2 = sp.inverse_transform(X)
    for name in sp.param_order:
        a, b = df[name].values, df2[name].values
        if df[name].dtype.kind in "fc":
            assert np.allclose(a.astype(float), b.astype(float), atol=1e-6), name
        else:
            assert (a == b).all(), name


def test_sample_within_bounds():
    sp = DesignSpace(MIXED_SPEC)
    df = sp.sample(64, seed=1)
    assert df["n"].between(-2, 2).all()
    assert df["p"].between(1e-4, 1.0).all()
    assert df["i"].between(0, 7).all()
    assert set(df["c"]).issubset({"red", "green", "blue"})
    assert df["ie"].isin([16, 32, 64, 128, 256, 512, 1024]).all()
    assert (df["si"] % 10 == 0).all()


def test_sobol_sample():
    sp = DesignSpace(MIXED_SPEC)
    X = sp.sobol_sample_opt(16, seed=0)
    assert X.shape == (16, sp.num_cols)
    assert np.all(X >= sp.opt_lb - 1e-9) and np.all(X <= sp.opt_ub + 1e-9)
    # discrete columns integral
    for c in sp.discrete_numeric_dims + sp.cat_dims:
        assert np.allclose(X[:, c], np.round(X[:, c]))


def test_pow_param_log_frame():
    sp = DesignSpace([{"name": "p", "type": "pow", "lb": 1e-3, "ub": 1.0}])
    df = pd.DataFrame({"p": [1e-3, 1e-2, 1.0]})
    X = sp.transform(df)
    assert np.allclose(X[:, 0], [-3, -2, 0])


def test_permutation_param():
    sp = DesignSpace([{"name": "perm", "type": "perm", "length": 4}])
    assert sp.num_cols == 4
    df = sp.sample(8, seed=0)
    for p in df["perm"]:
        assert sorted(p) == [0, 1, 2, 3]
    X = sp.transform(df)
    df2 = sp.inverse_transform(X + 0.3)  # perturbed → repaired to perms
    for p in df2["perm"]:
        assert sorted(p) == [0, 1, 2, 3]


def test_duplicate_name_raises():
    with pytest.raises(ValueError):
        DesignSpace([
            {"name": "x", "type": "num", "lb": 0, "ub": 1},
            {"name": "x", "type": "num", "lb": 0, "ub": 1},
        ])


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        DesignSpace([{"name": "x", "type": "nope", "lb": 0, "ub": 1}])
