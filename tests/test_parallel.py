"""Multi-chip data-parallel tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bcnf_tpu.models import (
    ConcatenateCondition,
    CondRealNVP,
    FeatureNetworkStack,
    FullyConnectedFeatureNetwork,
)
from bcnf_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch
from bcnf_tpu.utils.misc import inn_nll_loss


@pytest.fixture(scope="module")
def model_and_params():
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=4),
            FullyConnectedFeatureNetwork(sizes=[4, 16, 8]),
        ]
    )
    model = CondRealNVP(
        size=3, nested_sizes=[16], n_blocks=3, n_conditions=8,
        feature_network_stack=stack, act_norm=True, random_state=0,
    )
    return model, model.init(jax.random.key(0))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_loss_matches_single_device(model_and_params):
    model, params = model_and_params
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)

    def loss_fn(params, y, cond):
        z, ld = model.forward(params, y, cond)
        return inn_nll_loss(z, ld)

    expected = float(jax.jit(loss_fn)(params, y, cond))

    p_repl = replicate(mesh, params)
    y_s, c_s = shard_batch(mesh, (y, cond))
    got = float(jax.jit(loss_fn)(p_repl, y_s, c_s))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_sharded_gradients_match(model_and_params):
    model, params = model_and_params
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)

    def loss_fn(params, y, cond):
        z, ld = model.forward(params, y, cond)
        return inn_nll_loss(z, ld)

    g_single = jax.jit(jax.grad(loss_fn))(params, y, cond)
    g_sharded = jax.jit(jax.grad(loss_fn))(
        replicate(mesh, params), *shard_batch(mesh, (y, cond))
    )
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_train_step_runs(model_and_params):
    model, params = model_and_params
    mesh = make_mesh()
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    params = replicate(mesh, params)
    opt_state = replicate(mesh, optimizer.init(params))
    rng = np.random.default_rng(2)
    y, cond = shard_batch(
        mesh,
        (
            jnp.asarray(rng.normal(size=(32, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(32, 4)), jnp.float32),
        ),
    )

    @jax.jit
    def step(params, opt_state, y, cond):
        def loss_fn(p):
            z, ld = model.forward(p, y, cond)
            return inn_nll_loss(z, ld)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, y, cond)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_batch_sharding_layout():
    mesh = make_mesh()
    s = batch_sharding(mesh, 3)
    x = jax.device_put(jnp.zeros((16, 5, 2)), s)
    assert x.sharding.is_equivalent_to(s, 3)


def test_sharded_ranks_match_single_device(model_and_params):
    """Mesh-sharded calibration (eval --dp-devices): GSPMD partitions the
    rank computation over condition rows, so the ranks must be IDENTICAL to
    the single-device run (same ops, same PRNG draws — SURVEY.md section
    5.8's 'all-gather only at the metrics step')."""
    from bcnf_tpu.eval.calibration import compute_y_hat_ranks

    model, params = model_and_params
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
    kwargs = dict(M_samples=64, key=jax.random.key(3),
                  sample_batch_size=32, batch_size=16)
    ranks_1 = compute_y_hat_ranks(model, params, y, cond, **kwargs)
    ranks_8 = compute_y_hat_ranks(model, params, y, cond, mesh=make_mesh(), **kwargs)
    np.testing.assert_array_equal(ranks_1, ranks_8)


def test_sharded_resimulate_matches_single_device(model_and_params):
    """Mesh-sharded resimulation returns the same trajectories as the
    single-device run (rows split over the data axis, no math change)."""
    from bcnf_tpu.config import ParameterIndexMapping
    from bcnf_tpu.simulation.resimulation import resimulate

    model, _ = model_and_params

    class TinyPosterior:
        """A stand-in model whose sample() is deterministic in the key, so
        the mesh/single-device comparison isolates the resimulation path."""

        parameter_index_mapping = ParameterIndexMapping(["x0_z", "v0_z", "m"])

        def sample(self, params, key, m, *conditions):
            n = conditions[0].shape[0]
            base = jax.random.uniform(key, (m, n, 3), minval=0.5, maxval=1.5)
            return base + jnp.asarray([5.0, 0.0, 0.0])

    tiny = TinyPosterior()
    cond = jnp.asarray(np.random.default_rng(1).normal(size=(16, 4)), jnp.float32)
    data = {"b": np.full(16, 0.1), "rho": np.full(16, 1.2), "r": np.full(16, 0.1)}
    kwargs = dict(m_samples=8, key=jax.random.key(5), sample_batch_size=8)
    X1 = resimulate(tiny, None, 1.0, 1 / 15, data, None, cond, **kwargs)
    X8 = resimulate(tiny, None, 1.0, 1 / 15, data, None, cond, mesh=make_mesh(), **kwargs)
    np.testing.assert_allclose(X1, X8, rtol=0, atol=1e-6)
