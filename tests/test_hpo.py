"""GP hyperparameter-optimization tests (host-only)."""

import numpy as np

from bcnf_tpu.hpo import Categorical, Integer, Real, gp_minimize_fixed, load_checkpoint


def _quadratic(x):
    # minimum at (0.3, 5, 'b')
    return (x[0] - 0.3) ** 2 + 0.01 * (x[1] - 5) ** 2 + (0.0 if x[2] == "b" else 0.5)


SPACE = [
    Real(0.0, 1.0),
    Integer(0, 10),
    Categorical(["a", "b", "c"]),
]


def test_gp_minimize_finds_minimum():
    res = gp_minimize_fixed(_quadratic, SPACE, n_calls=25, n_initial_points=8, random_state=0)
    assert res.fun < 0.05
    assert abs(res.x[0] - 0.3) < 0.25
    assert len(res.x_iters) == 25 and len(res.func_vals) == 25


def test_gp_minimize_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "hpo.pkl")
    res1 = gp_minimize_fixed(
        _quadratic, SPACE, n_calls=6, n_initial_points=4, checkpoint_file=ckpt, random_state=1
    )
    state = load_checkpoint(ckpt)
    assert len(state["func_vals"]) == 6

    # resume continues exactly where it left off
    res2 = gp_minimize_fixed(
        _quadratic, SPACE, n_calls=10, n_initial_points=4, checkpoint_file=ckpt, random_state=1
    )
    assert len(res2.func_vals) == 10
    assert res2.func_vals[:6] == res1.func_vals


def test_dimension_roundtrips():
    r = Real(1e-5, 1e-1, prior="log-uniform")
    assert abs(r.to_unit(r.from_unit(0.37)) - 0.37) < 1e-9
    i = Integer(2, 20)
    assert i.from_unit(i.to_unit(7)) == 7
    c = Categorical(["x", "y", "z"])
    assert c.from_unit(c.to_unit("y")) == "y"


def test_gp_handles_nan_objective():
    calls = []

    def f(x):
        calls.append(x)
        return float("nan") if x[1] < 2 else (x[0] - 0.5) ** 2

    res = gp_minimize_fixed(f, SPACE, n_calls=15, n_initial_points=6, random_state=2)
    assert np.isfinite(res.fun)
