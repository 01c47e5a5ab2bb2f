"""Pallas fused coupling kernel vs the reference XLA path (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnf_tpu.models.cnf import AffineCoupling
from bcnf_tpu.ops.coupling_kernel import fused_affine_coupling, mlp_params_to_kernel_args


@pytest.fixture(scope="module")
def setup():
    layer = AffineCoupling(input_size=19, nested_sizes=[64, 64, 64], n_conditions=32)
    params = layer.init(jax.random.key(0))
    B = 64
    y = jax.random.normal(jax.random.key(1), (B, 19))
    h = jax.random.normal(jax.random.key(2), (B, 32))
    return layer, params, y, h


def test_kernel_forward_matches_xla(setup):
    layer, params, y, h = setup
    proj = layer.cond_proj(params, h)
    with jax.default_matmul_precision("highest"):
        z_ref, ld_ref = layer.forward(params, y, h, proj)
        args = mlp_params_to_kernel_args(params["a"], layer.d_a)
        z_b, ld = fused_affine_coupling(
            y[:, : layer.d_a], y[:, layer.d_a:], proj["a"][0],
            interpret=True, **args,
        )
    np.testing.assert_allclose(np.asarray(z_b), np.asarray(z_ref[:, layer.d_a:]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref), atol=1e-4)


def test_kernel_inverse_matches_xla(setup):
    layer, params, y, h = setup
    proj = layer.cond_proj(params, h)
    with jax.default_matmul_precision("highest"):
        z_ref, _ = layer.forward(params, y, h, proj)
        args = mlp_params_to_kernel_args(params["a"], layer.d_a)
        y_b = fused_affine_coupling(
            z_ref[:, : layer.d_a], z_ref[:, layer.d_a:], proj["a"][0],
            inverse=True, interpret=True, **args,
        )
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y[:, layer.d_a:]), atol=1e-4)


@pytest.mark.skipif(
    not os.environ.get("BCNF_RUN_SLOW"),
    reason="lax.scan over interpret-mode pallas_call is pathologically slow on "
    "CPU (>20 min for a 2-block toy model); the model-level pallas path is "
    "validated on real TPU by scripts/pallas_check.py",
)
def test_model_pallas_path_matches_xla(monkeypatch):
    """Full-flow forward/inverse with use_pallas must match the XLA path.

    Interpret mode is forced via pltpu so the test runs on CPU.
    """
    from jax.experimental.pallas import tpu as pltpu

    from bcnf_tpu.models import (
        ConcatenateCondition,
        CondRealNVP,
        FeatureNetworkStack,
        FullyConnectedFeatureNetwork,
    )

    def build(use_pallas):
        stack = FeatureNetworkStack(
            [
                ConcatenateCondition(input_size=None, output_size=4),
                FullyConnectedFeatureNetwork(sizes=[4, 16, 8]),
            ]
        )
        return CondRealNVP(
            size=5, nested_sizes=[16], n_blocks=2, n_conditions=8,
            feature_network_stack=stack, act_norm=True, random_state=0,
            use_pallas=use_pallas,
        )

    m_ref, m_pal = build(False), build(True)
    # the per-coupling kernel is opt-in since round 2 (whole-flow kernel is
    # the production path), and the gate requires a TPU backend
    m_pal.use_pallas_coupling = True
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    params = m_ref.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (4, 5))
    cond = jax.random.normal(jax.random.key(2), (4, 4))

    z_ref, ld_ref = m_ref.forward(params, y, cond)
    with pltpu.force_tpu_interpret_mode():
        z_pal, ld_pal = m_pal.forward(params, y, cond)
        y_rec = m_pal.inverse(params, z_pal, cond)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_pal), np.asarray(ld_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)


def test_kernel_batch_tiling(setup):
    """Grid over batch tiles must agree with a single-tile launch."""
    layer, params, y, h = setup
    proj = layer.cond_proj(params, h)
    args = mlp_params_to_kernel_args(params["a"], layer.d_a)
    with jax.default_matmul_precision("highest"):
        z1, ld1 = fused_affine_coupling(
            y[:, : layer.d_a], y[:, layer.d_a:], proj["a"][0],
            block_b=64, interpret=True, **args,
        )
        z2, ld2 = fused_affine_coupling(
            y[:, : layer.d_a], y[:, layer.d_a:], proj["a"][0],
            block_b=16, interpret=True, **args,
        )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld2), atol=1e-5)
