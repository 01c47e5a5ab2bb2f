"""Every shipped run config must build a model and trace a forward pass.

Covers the reference's published config families (reference
`configs/runs/{old,nll,hybrid,dev}/`): old trajectory_{FC,LSTM,TRF} grid,
nll t_{FC,LSTM,DLSTM,PTRF} tiers, hybrid grid + DFC/DPTRF, and the dev
custom-layer variants (AnyGLU/two_way, LinearFFTEnriched couplings).
Uses `jax.eval_shape` so no FLOPs are spent — this is a structural test.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from bcnf_tpu.config import load_config
from bcnf_tpu.models import CondRealNVP
from bcnf_tpu.simulation.physics import n_steps_for

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "runs", "**", "*.yaml"), recursive=True)
)


@pytest.fixture(autouse=True)
def _root_env(monkeypatch):
    monkeypatch.setenv("BCNF_ROOT", REPO)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_and_traces(path):
    config = load_config(path)
    model = CondRealNVP.from_config(config)
    model.verify()

    data_cfg = config["data"]
    n_steps = n_steps_for(float(data_cfg["T"]), float(data_cfg["dt"]))
    batch = 2
    y = jnp.zeros((batch, model.size))
    conditions = []
    for group in config["global"]["conditions"]:
        if list(group) == ["trajectories"]:
            conditions.append(jnp.zeros((batch, n_steps, 3)))
        elif "videos" in group or "cams" in group or "render" in group:
            conditions.append(jnp.zeros((batch, 2, n_steps, 90, 160)))
        else:  # camera metadata groups: per-key widths for num_cams=2
            widths = {"cam_radian": 2, "cam_radius": 1, "cam_angles": 2, "cam_heights": 2}
            conditions.append(jnp.zeros((batch, sum(widths.get(k, 1) for k in group))))

    params_shape = jax.eval_shape(lambda: model.init(jax.random.key(0)))
    assert params_shape  # non-empty pytree

    def fwd(params, y, *conds):
        return model.forward(params, y, *conds)

    z_shape, logdet_shape = jax.eval_shape(
        fwd, params_shape, y, *conditions
    )
    assert z_shape.shape == (batch, model.size)
    assert logdet_shape.shape == (batch,)
