"""Fused Pallas kernels inside shard_map (the Trainer's DP step body).

XLA cannot shard-propagate through a Pallas custom call, so plain
jit-with-sharding must avoid the fused path on a multi-device mesh. The
Trainer instead wraps its DP train step in `shard_map`, where the per-shard
trace is single-device and the kernel is legal (`bcnf_tpu.models.cnf
.spmd_local`). These tests run the kernels in Pallas interpret mode
(BCNF_PALLAS_INTERPRET=1) on the 8-device virtual CPU mesh and assert the
sharded fused path reproduces the single-device XLA path — values and
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from bcnf_tpu.models import (
    ConcatenateCondition,
    CondRealNVP,
    FeatureNetworkStack,
    FullyConnectedFeatureNetwork,
)
from bcnf_tpu.models.cnf import spmd_local
from bcnf_tpu.parallel import make_mesh, replicate, shard_batch
from bcnf_tpu.utils.misc import inn_nll_loss


@pytest.fixture(scope="module")
def fusable_model():
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=4),
            FullyConnectedFeatureNetwork(sizes=[4, 32, 16]),
        ]
    )
    model = CondRealNVP(
        size=6, nested_sizes=[24, 24], n_blocks=4, n_conditions=16,
        feature_network_stack=stack, act_norm=True, random_state=0,
        use_pallas=True,
    )
    # tiny test batches must still exercise the fused path despite the
    # measured batch-size floor (CondRealNVP.fused_train_min_batch)
    model.fused_train_min_batch = 1
    return model, model.init(jax.random.key(0))


def _data(n=16):
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    return y, cond


def test_gate_opens_inside_spmd_local(fusable_model, monkeypatch):
    monkeypatch.setenv("BCNF_PALLAS_INTERPRET", "1")
    model, _ = fusable_model
    assert not model._use_fused_train(train=True)  # 8 devices visible
    with spmd_local():
        assert model._use_fused_train(train=True)
        assert model._use_fused(train=False)


def test_fused_forward_inside_shard_map_matches_xla(fusable_model, monkeypatch):
    model, params = fusable_model
    y, cond = _data()

    # single-device XLA reference (gate closed: no interpret env yet)
    z_ref, ld_ref = jax.jit(lambda p, y, c: model.forward(p, y, c))(params, y, cond)

    monkeypatch.setenv("BCNF_PALLAS_INTERPRET", "1")
    mesh = make_mesh(4)

    def local_fwd(p, y, c):
        with spmd_local():
            assert model._use_fused_train(train=False)
            return model.forward(p, y, c)

    fwd = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    z_k, ld_k = jax.jit(fwd)(replicate(mesh, params), *shard_batch(mesh, (y, cond)))
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_ref), atol=2e-4)


def test_fused_grads_inside_shard_map_match_xla(fusable_model, monkeypatch):
    model, params = fusable_model
    y, cond = _data()

    def loss_fn(p, y, c):
        z, ld = model.forward(p, y, c, train=True)
        return inn_nll_loss(z, ld)

    g_ref = jax.jit(jax.grad(loss_fn))(params, y, cond)

    monkeypatch.setenv("BCNF_PALLAS_INTERPRET", "1")
    mesh = make_mesh(4)

    def local_grads(p, y, c):
        with spmd_local():
            g = jax.grad(loss_fn)(p, y, c)
        return jax.lax.pmean(g, "data")

    grad_fn = shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    g_k = jax.jit(grad_fn)(replicate(mesh, params), *shard_batch(mesh, (y, cond)))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_k),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}",
        )
