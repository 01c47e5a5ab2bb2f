"""Fused Pallas LSTM recurrence (ops/lstm_kernel.py) vs the lax.scan path.

Runs in interpret mode on CPU: the whole time loop lives inside one kernel
invocation per batch tile, so interpret overhead is bounded (unlike pallas
calls inside a lax.scan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnf_tpu.ops.lstm import _direction_scan, lstm_apply, lstm_cell_init, lstm_init
from bcnf_tpu.ops.lstm_kernel import fused_direction

B, T, F, H = 8, 10, 3, 12


@pytest.fixture(scope="module")
def setup():
    params = lstm_cell_init(jax.random.key(0), F, H)
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    return params, x


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_forward_matches_scan(setup, reverse):
    params, x = setup
    ref = _direction_scan(params, x, H, reverse)
    out = fused_direction(params, x, H, reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_gradient_matches_scan(setup, reverse):
    """The hand-written VJP (recompute-gates backward) must match autodiff
    through the scan for both input-projection and recurrent weights."""
    params, x = setup

    def loss_scan(p, x):
        return jnp.sum(jnp.tanh(_direction_scan(p, x, H, reverse)) ** 2)

    def loss_fused(p, x):
        return jnp.sum(jnp.tanh(fused_direction(p, x, H, reverse, interpret=True)) ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    g_out = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_out), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_untileable_batch_falls_back():
    params = lstm_cell_init(jax.random.key(0), F, H)
    x = jax.random.normal(jax.random.key(1), (7, T, F))  # 7 % 256 != 0 -> tile_b=7
    # tile_b clamps to B, so any B works; force a non-dividing tile instead
    assert fused_direction(params, x, H, False, tile_b=4, interpret=True) is None


def test_lstm_apply_env_flag_routes_to_fused(setup, monkeypatch):
    """BCNF_FUSED_LSTM=1 routes lstm_apply through the kernel (interpret via
    force mode) and matches the scan output end-to-end (2-layer bidir)."""
    from jax.experimental.pallas import tpu as pltpu

    params = lstm_init(jax.random.key(2), F, H, num_layers=2, bidirectional=True)
    x = jax.random.normal(jax.random.key(3), (B, T, F))
    ref = lstm_apply(params, x, H)
    monkeypatch.setenv("BCNF_FUSED_LSTM", "1")
    with pltpu.force_tpu_interpret_mode():
        out = lstm_apply(params, x, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
