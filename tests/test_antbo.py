"""AntBO sequence-BO tests: constraints, constrained local search,
guided-restart Casmopolitan on a toy binding objective."""

import numpy as np
import pytest

from hebo_tpu.optimizers.antbo import (
    AA_ALPHABET,
    AntBOOptimizer,
    check_cdr_constraints,
    sequence_space,
)


def test_cdr_constraints():
    assert check_cdr_constraints("ACDEFGHIKLM")
    assert not check_cdr_constraints("AAAAAGHIKLM")  # 5-run repeat
    assert not check_cdr_constraints("ANASGHIKLMT")  # N-A-S glycosylation
    assert not check_cdr_constraints("KKKKRGHIKLM")  # charge +5 > 2
    assert check_cdr_constraints("NPSAGHIKLMT")  # N-P-S is allowed (X=P)


def _toy_binding(seqs):
    """Toy binding energy: favor 'W' at even positions, 'G' at odd."""
    out = []
    for s in seqs:
        e = sum(-1.0 if (c == "W" and i % 2 == 0) or (c == "G" and i % 2 == 1)
                else 0.1 for i, c in enumerate(s))
        out.append(e)
    return np.asarray(out).reshape(-1, 1)


def test_antbo_loop_improves():
    opt = AntBOOptimizer(
        seq_len=6, n_init=6,
        model_kwargs={"num_epochs": 10},
    )
    for it in range(8):
        rec = opt.suggest(2)
        seqs = ["".join(row) for _, row in rec.iterrows()]
        for s in seqs:
            assert check_cdr_constraints(s) or it < 3  # init may violate
        opt.observe(rec, _toy_binding(seqs))
    assert np.isfinite(opt.best_y)
    rand_mean = 0.1 * 6
    assert opt.best_y < rand_mean


def test_table_of_candidates_restriction():
    space = sequence_space(4)
    table = space.transform(space.sample(32, seed=0))
    opt = AntBOOptimizer(
        seq_len=4, n_init=4, constraint=None,
        table_of_candidates=table,
        model_kwargs={"num_epochs": 8},
    )
    for _ in range(4):
        rec = opt.suggest(2)
        opt.observe(rec, _toy_binding(
            ["".join(row) for _, row in rec.iterrows()]
        ))
    # post-init suggestions must come from the table
    X = opt.space.transform(opt.X.iloc[4:])
    tab = {tuple(r) for r in table.tolist()}
    frac_in = np.mean([tuple(r) in tab for r in X.tolist()])
    assert frac_in >= 0.5


def test_guided_restart_path():
    opt = AntBOOptimizer(seq_len=5, n_init=4, model_kwargs={"num_epochs": 8})
    opt.tr_manager.radius_min = 10.0  # force immediate restarts
    for _ in range(4):
        rec = opt.suggest(2)
        opt.observe(rec, _toy_binding(["".join(r) for _, r in rec.iterrows()]))
    assert opt.tr_manager.restart_count >= 1
