"""On-device infinite-data training tests."""

import jax
import numpy as np

from bcnf_tpu.config import ParameterIndexMapping
from bcnf_tpu.models import (
    ConcatenateCondition,
    CondRealNVP,
    FeatureNetworkStack,
    FullyConnectedFeatureNetwork,
)
from bcnf_tpu.train.online import OnlineSimulator, train_online
from tests.test_sampling import PRIOR

PARAMS = ["x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z", "g",
          "w_x", "w_y", "w_z", "b", "m", "a_x", "a_y", "a_z", "r", "A", "Cd", "rho"]


def _simulator(T=0.5, dt=0.1):
    return OnlineSimulator(
        PRIOR,
        ParameterIndexMapping(PARAMS),
        condition_groups=[["trajectories"]],
        dt=dt,
        T=T,
    )


def test_sample_batch_shapes_and_finiteness():
    sim = _simulator()
    y, conds = sim.sample_batch(jax.random.key(0), 32)
    assert y.shape == (32, 19)
    assert conds[0].shape == (32, 5, 3)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(conds[0])).all()
    # 'g' column resolves through the g_z alias and is negative (gravity down)
    g_col = np.asarray(y[:, PARAMS.index("g")])
    assert (g_col < 0).all()


def test_sample_batch_deterministic_per_key():
    sim = _simulator()
    y1, _ = sim.sample_batch(jax.random.key(7), 16)
    y2, _ = sim.sample_batch(jax.random.key(7), 16)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3, _ = sim.sample_batch(jax.random.key(8), 16)
    assert not np.array_equal(np.asarray(y1), np.asarray(y3))


def test_train_online_improves():
    sim = _simulator()
    n_cond = 24
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=3),
            FullyConnectedFeatureNetwork(sizes=[15, 32, n_cond]),
        ]
    )
    model = CondRealNVP(
        size=19, nested_sizes=[32], n_blocks=3, n_conditions=n_cond,
        feature_network_stack=stack, act_norm=True, random_state=0,
    )
    params = model.init(jax.random.key(0))
    params, history = train_online(
        model, params, sim, n_steps=60, batch_size=64, lr=2e-3, eval_every=20,
    )
    evals = [v for _, v in history["eval_nll"]]
    assert evals[-1] < evals[0], f"online training did not improve: {evals}"
    assert history["stop_reason"] == "max_steps"
