"""Flow-core tests: invertibility, log-det vs autodiff Jacobian, config build.

Models the reference's invertibility round-trip intent (`tests/test_cnf.py`
in `/root/reference`, which is stale at HEAD — SURVEY.md section 4) and adds
the much stronger log|det J| check against `jax.jacfwd`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnf_tpu.models import (
    AffineCoupling,
    CondRealNVP,
    ConcatenateCondition,
    FeatureNetworkStack,
    FullyConnectedFeatureNetwork,
    LSTMFeatureNetwork,
    RQSCoupling,
    Transformer,
)


def _feature_stack(n_cond: int) -> FeatureNetworkStack:
    return FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=6),
            FullyConnectedFeatureNetwork(sizes=[6, 32, n_cond]),
        ]
    )


def _model(**kwargs) -> CondRealNVP:
    defaults = dict(
        size=5,
        nested_sizes=[16, 16],
        n_blocks=4,
        n_conditions=8,
        feature_network_stack=_feature_stack(8),
        act_norm=True,
        random_state=0,
    )
    defaults.update(kwargs)
    return CondRealNVP(**defaults)


@pytest.mark.parametrize("two_way", [False, True])
@pytest.mark.parametrize("coupling", ["affine", "rqs"])
def test_coupling_invertibility(two_way, coupling):
    cls = AffineCoupling if coupling == "affine" else RQSCoupling
    layer = cls(input_size=5, nested_sizes=[16], n_conditions=3, two_way=two_way)
    params = layer.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (7, 5))
    h = jax.random.normal(jax.random.key(2), (7, 3))
    proj = layer.cond_proj(params, h)
    # f32 matmul accumulation, as CondRealNVP uses (precision="highest"):
    # default TPU-style bf16 matmuls lose invertibility for two_way couplings
    with jax.default_matmul_precision("highest"):
        z, ld = layer.forward(params, y, h, proj)
        y_rec = layer.inverse(params, z, h, proj)
    # two_way chains two conditioner evaluations through exp(tanh(.)) in f32;
    # ~1e-5-scale round-trip error is expected numerics, not structure
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)
    assert ld.shape == (7,)


def test_cond_proj_matches_concat():
    """The hoisted condition projection must equal the naive concat path."""
    layer = AffineCoupling(input_size=5, nested_sizes=[16, 16], n_conditions=4)
    params = layer.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (3, 5))
    h = jax.random.normal(jax.random.key(2), (3, 4))
    z_fast, ld_fast = layer.forward(params, y, h, layer.cond_proj(params, h))
    z_ref, ld_ref = layer.forward(params, y, h, None)
    np.testing.assert_allclose(np.asarray(z_fast), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_fast), np.asarray(ld_ref), atol=1e-5)


@pytest.mark.parametrize("two_way", [False, True])
@pytest.mark.parametrize("act_norm", [False, True])
def test_flow_invertibility(two_way, act_norm):
    model = _model(two_way=two_way, act_norm=act_norm)
    params = model.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (9, 5))
    cond = jax.random.normal(jax.random.key(2), (9, 6))
    z, ld = model.forward(params, y, cond)
    y_rec = model.inverse(params, z, cond)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)
    assert z.shape == y.shape and ld.shape == (9,)


@pytest.mark.parametrize("coupling", ["affine", "rqs"])
@pytest.mark.slow
def test_log_det_matches_autodiff_jacobian(coupling):
    model = _model(coupling=coupling, n_blocks=3, two_way=True)
    params = model.init(jax.random.key(0))
    cond = jax.random.normal(jax.random.key(2), (1, 6))

    def f(y_single):
        z, _ = model.forward(params, y_single[None], cond)
        return z[0]

    y = jax.random.normal(jax.random.key(1), (4, 5)) * 0.5
    _, ld = model.forward(params, y, jnp.tile(cond, (4, 1)))
    # f32 spline derivative products accumulate ~1e-4-scale logdet error
    atol = 2e-3 if coupling == "rqs" else 1e-4
    for i in range(4):
        J = jax.jacfwd(f)(y[i])
        _, expected = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(ld[i]), expected, atol=atol)


def test_unconditional_flow():
    model = CondRealNVP(size=4, nested_sizes=[8], n_blocks=2, n_conditions=0)
    params = model.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (6, 4))
    z, ld = model.forward(params, y)
    y_rec = model.inverse(params, z)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-5)


def test_sample_shapes_and_moments():
    model = _model()
    params = model.init(jax.random.key(0))
    cond = jax.random.normal(jax.random.key(2), (3, 6))
    samples = model.sample(params, jax.random.key(3), 50, cond)
    assert samples.shape == (50, 3, 5)
    assert np.isfinite(np.asarray(samples)).all()
    # log_prob is finite
    lp = model.log_prob(params, samples[:, 0, :], jnp.tile(cond[:1], (50, 1)))
    assert np.isfinite(np.asarray(lp)).all()


def test_from_config_lstm():
    config = {
        "global": {"parameter_selection": ["x0_x", "x0_y", "x0_z", "v0_x", "v0_z"]},
        "model": {
            "kwargs": {
                "size": 5,
                "nested_sizes": [32, 32],
                "n_conditions": 16,
                "n_blocks": 3,
                "act_norm": True,
                "layer": "Linear",
                "activation": "GELU",
                "random_state": 2024,
            }
        },
        "feature_networks": [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
            {
                "type": "LSTM",
                "kwargs": {
                    "input_size": 3,
                    "hidden_size": 8,
                    "output_size": 16,
                    "num_layers": 2,
                    "bidirectional": True,
                    "pooling": "mean",
                },
            },
        ],
    }
    model = CondRealNVP.from_config(config)
    params = model.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (4, 5))
    traj = jax.random.normal(jax.random.key(2), (4, 30, 3))
    z, ld, h = model.forward(params, y, traj, return_features=True)
    assert z.shape == (4, 5) and h.shape == (4, 16)
    y_rec = model.inverse(params, z, traj)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)


def test_transformer_feature_network():
    trf = Transformer(
        input_size=3, trf_size=16, n_heads=4, ff_size=32, n_blocks=2,
        output_size=10, dropout=0.1, add_positional_embeddings=True,
    )
    params = trf.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (5, 30, 3))
    out = trf.apply(params, x)
    assert out.shape == (5, 10)
    # dropout active in training mode changes outputs
    out_train = trf.apply(params, x, rng=jax.random.key(2), train=True)
    assert not np.allclose(np.asarray(out), np.asarray(out_train))


def test_lstm_pooling_over_time_axis():
    """SURVEY.md Q1: output must be (batch, out) regardless of batch != seq."""
    net = LSTMFeatureNetwork(input_size=3, hidden_size=8, output_size=16, num_layers=2)
    params = net.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (5, 30, 3))  # batch 5 != seq 30
    out = net.apply(params, x)
    assert out.shape == (5, 16)


def test_hybrid_head():
    model = _model(hybrid=True)
    params = model.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (4, 5))
    cond = jax.random.normal(jax.random.key(2), (4, 6))
    z, ld, h = model.forward(params, y, cond, return_features=True)
    y_hat = model.predict_head(params, h)
    assert y_hat.shape == y.shape


@pytest.mark.slow
def test_remat_grads_match_baseline():
    """Block-boundary remat (CondRealNVP.remat) is a pure memory/HBM-traffic
    optimization: loss and gradients must be bit-comparable to the
    non-remat scan."""
    from bcnf_tpu.utils.misc import inn_nll_loss

    model = _model()
    params = model.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (16, 5))
    cond = jax.random.normal(jax.random.key(2), (16, 6))

    def loss_fn(p):
        z, ld = model.forward(p, y, cond)
        return inn_nll_loss(z, ld)

    loss0, g0 = jax.value_and_grad(loss_fn)(params)
    model.remat = True
    loss1, g1 = jax.value_and_grad(loss_fn)(params)

    assert jnp.allclose(loss0, loss1, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_ortho_is_not_trainable():
    """The orthonormal mixing matrices are fixed buffers (reference
    `cnf.py:322-324`): gradients must be exactly zero so Adam never drifts
    them off the orthonormal manifold (which would break logdet=0 and
    inverse-via-transpose)."""
    from bcnf_tpu.utils.misc import inn_nll_loss

    model = _model()
    params = model.init(jax.random.key(0))
    y = jax.random.normal(jax.random.key(1), (16, 5))
    cond = jax.random.normal(jax.random.key(2), (16, 6))

    def loss_fn(p):
        z, ld = model.forward(p, y, cond)
        return inn_nll_loss(z, ld)

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads["blocks"]["ortho"]).max()) == 0.0

    import optax

    opt = optax.adam(1e-2)
    updates, _ = opt.update(grads, opt.init(params), params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params["blocks"]["ortho"]), np.asarray(params["blocks"]["ortho"])
    )
