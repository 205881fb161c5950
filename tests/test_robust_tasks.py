"""AIRBO robust-BO problem family: RKHS, corruption, robot push."""

import numpy as np

from hebo_tpu.tasks.robust import (
    CorruptedTask,
    RKHSTask,
    RobotPushTask,
    UncertainEvalWrapper,
    large_corruption,
    rkhs_synth,
    small_corruption,
)


def test_rkhs_max_location_and_value():
    xs = np.linspace(0, 1, 20001)
    f = rkhs_synth(xs)
    i = int(np.argmax(f))
    # published optimum: f(0.89235) = 5.73839
    assert abs(xs[i] - 0.89235) < 2e-3
    assert abs(f[i] - 5.73839) < 5e-2


def test_rkhs_task_minimization_frame():
    t = RKHSTask()
    df = t.space.sample(8, seed=0)
    y = t(df)
    assert y.shape == (8, 1)
    assert np.all(np.isfinite(y))


def test_corruption_presets_scale():
    x = np.linspace(0, 1, 512)
    s, l = small_corruption(x), large_corruption(x)
    assert np.max(np.abs(l)) > np.max(np.abs(s))
    assert np.all(np.isfinite(s)) and np.all(np.isfinite(l))
    # gate switches the ripple fully off on half the square-wave period
    assert np.mean(np.abs(s) < 1e-12) > 0.2


def test_corrupted_task_wraps():
    base = RKHSTask()
    ct = CorruptedTask(base, corruption="large", scale=1.0)
    df = base.space.sample(16, seed=1)
    yb, yc = base(df), ct(df)
    assert yc.shape == yb.shape
    assert not np.allclose(yb, yc)


def test_robot_push_deterministic_and_solvable():
    task = RobotPushTask(dim=3)
    df = task.space.sample(32, seed=0)
    y1, y2 = task(df), task(df)
    assert np.allclose(y1, y2)  # deterministic
    assert np.all(y1 >= 0)
    # pushing from directly opposite the goal with a generous duration
    # must land the puck near the goal (objective ≪ do-nothing distance)
    import pandas as pd

    g = task.goal
    d = g / np.linalg.norm(g)
    start = -d * 3.0
    # approach takes (3-1)/v = 2 s; puck must slide |g| units:
    # v·τ − ½μτ² = |g| with v=1, μ=0.05 → τ = 20 − sqrt(400 − 40|g|)
    tau = 20.0 - np.sqrt(400.0 - 40.0 * np.linalg.norm(g))
    aimed = pd.DataFrame(
        {"rx": [start[0]], "ry": [start[1]], "t": [2.0 + tau]}
    )
    y_aim = task(aimed)[0, 0]
    assert y_aim < 1.0  # ends within one puck radius of the goal
    # a hopeless push (walks away from contact budget) stays far
    lazy = pd.DataFrame({"rx": [4.9], "ry": [4.9], "t": [1.0]})
    assert task(lazy)[0, 0] > y_aim + 1.0


def test_robot_push_4d_angle_matters():
    task = RobotPushTask(dim=4)
    import pandas as pd

    row = {"rx": [-3.0], "ry": [-4.0], "t": [10.0]}
    y0 = task(pd.DataFrame({**row, "phi": [0.0]}))[0, 0]
    y1 = task(pd.DataFrame({**row, "phi": [0.6]}))[0, 0]
    assert y0 != y1


def test_uncertain_wrapper_common_random_numbers():
    base = RobotPushTask(dim=3)
    df = base.space.sample(8, seed=2)
    w1 = UncertainEvalWrapper(base, input_std=0.05, seed=7)
    w2 = UncertainEvalWrapper(base, input_std=0.05, seed=7)
    a = np.hstack([w1(df), w1(df)])
    b = np.hstack([w2(df), w2(df)])
    assert np.allclose(a, b)  # CRN across runs
    assert not np.allclose(a[:, 0], a[:, 1])  # fresh noise per call


def test_uncertain_gp_on_rkhs_bo_loop():
    """AIRBO end-to-end: uncertain-input GP surrogate on the noisy RKHS."""
    from hebo_tpu import HEBO

    task = UncertainEvalWrapper(RKHSTask(), input_std=0.03, seed=0)
    opt = HEBO(
        task.space,
        model_name="uncertain_gp",
        rand_sample=8,
        model_config={"num_epochs": 8, "input_std": 0.03},
        pop=24,
        iters=12,
    )
    for _ in range(6):
        rec = opt.suggest(2)
        opt.observe(rec, task(rec))
    assert np.isfinite(opt.best_y)
    assert opt.best_y < 0.0  # found a region better than f=0 plateau
