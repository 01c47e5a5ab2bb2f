"""Whole-flow fused Pallas kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnf_tpu.models import (
    CondRealNVP,
    ConcatenateCondition,
    FeatureNetworkStack,
    FullyConnectedFeatureNetwork,
)
from bcnf_tpu.ops.flow_kernel import fused_flow, stack_flow_params


def _model(n_blocks=4, size=7, n_cond=16, nested=(24, 24, 24)):
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=6),
            FullyConnectedFeatureNetwork(sizes=[6, 32, n_cond]),
        ]
    )
    return CondRealNVP(
        size=size,
        nested_sizes=list(nested),
        n_blocks=n_blocks,
        n_conditions=n_cond,
        feature_network_stack=stack,
        act_norm=True,
        random_state=0,
    )


@pytest.fixture(scope="module")
def setup():
    model = _model()
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    N = 8  # condition rows
    draws = 16
    cond = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
    h = model.encode(params, (cond,))
    kargs, h_proj = model._fused_flow_args(params, h)
    return model, params, h, kargs, h_proj, N, draws, rng


def test_fused_forward_matches_xla(setup):
    model, params, h, kargs, h_proj, N, draws, rng = setup
    y = jnp.asarray(rng.normal(size=(draws * N, model.size)).astype(np.float32))

    z_k, ld_k = fused_flow(
        y, h_proj, **kargs, inverse=False, n_cond=N, block_b=2 * N, interpret=True
    )

    # XLA reference: replicate model.forward with the precomputed h
    y3 = y.reshape(draws, N, model.size)

    def fwd(yy):
        with jax.default_matmul_precision("highest"):
            # replicate model.forward but with precomputed h
            blocks, projs = model._block_xs(params, h)
            ld = jnp.zeros(yy.shape[:-1])
            def body(carry, xs):
                y_, l_ = carry
                blk, proj, _ = xs
                y_, l_an = model.actnorm.forward(blk["actnorm"], y_)
                l_ = l_ + l_an
                y_, l_c = model.coupling.forward(blk["coupling"], y_, h, proj, None, False)
                l_ = l_ + l_c
                y_ = y_ @ blk["ortho"]
                return (y_, l_ + 0.0), None
            n_inner = model.n_blocks - 1
            (y_, ld), _ = jax.lax.scan(
                body, (yy, ld), (blocks, projs, jnp.zeros((n_inner,)))
            )
            fin_proj = model.coupling.cond_proj(params["final"], h)
            y_, l_f = model.coupling.forward(params["final"], y_, h, fin_proj, None, False)
            return y_, ld + l_f

    z_ref = np.zeros_like(np.asarray(z_k).reshape(draws, N, model.size))
    ld_ref = np.zeros((draws, N), dtype=np.float32)
    for d in range(draws):
        zz, ll = fwd(y3[d])
        z_ref[d] = np.asarray(zz)
        ld_ref[d] = np.asarray(ll)

    np.testing.assert_allclose(
        np.asarray(z_k).reshape(draws, N, -1), z_ref, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ld_k).reshape(draws, N), ld_ref, atol=1e-4
    )


def test_fused_inverse_roundtrip(setup):
    model, params, h, kargs, h_proj, N, draws, rng = setup
    y = jnp.asarray(rng.normal(size=(draws * N, model.size)).astype(np.float32))
    z_k, _ = fused_flow(
        y, h_proj, **kargs, inverse=False, n_cond=N, block_b=2 * N, interpret=True
    )
    y_rec = fused_flow(
        z_k, h_proj, **kargs, inverse=True, n_cond=N, block_b=2 * N, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=5e-4)


def test_fused_inverse_matches_xla_inverse(setup):
    model, params, h, kargs, h_proj, N, draws, rng = setup
    z = jnp.asarray(rng.normal(size=(draws * N, model.size)).astype(np.float32))
    y_k = fused_flow(
        z, h_proj, **kargs, inverse=True, n_cond=N, block_b=2 * N, interpret=True
    )
    z3 = z.reshape(draws, N, model.size)
    y_ref = jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z3)
    np.testing.assert_allclose(
        np.asarray(y_k).reshape(draws, N, -1), np.asarray(y_ref), atol=1e-4
    )


def test_cond_chunking_small_blocks(setup):
    """block_b < N path (condition chunk sliced per tile)."""
    model, params, h, kargs, h_proj, N, draws, rng = setup
    z = jnp.asarray(rng.normal(size=(draws * N, model.size)).astype(np.float32))
    y_big = fused_flow(z, h_proj, **kargs, inverse=True, n_cond=N, block_b=4 * N, interpret=True)
    y_small = fused_flow(z, h_proj, **kargs, inverse=True, n_cond=N, block_b=N // 2, interpret=True)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_big), atol=1e-5)


def test_fused_x3_mode_accuracy(setup):
    """The hand-written BF16_BF16_F32_X3 dot decomposition must land within
    ~2e-3 of the f32 kernel (the advertised X3 fidelity), far better than
    plain bf16 (~1e-1 at this depth)."""
    model, params, h, kargs, h_proj, N, draws, rng = setup
    z = jnp.asarray(rng.normal(size=(draws * N, model.size)).astype(np.float32))
    y_f32 = fused_flow(z, h_proj, **kargs, inverse=True, n_cond=N, block_b=2 * N,
                       precision="highest", interpret=True)
    y_x3 = fused_flow(z, h_proj, **kargs, inverse=True, n_cond=N, block_b=2 * N,
                      precision="x3", interpret=True)
    err = np.abs(np.asarray(y_x3) - np.asarray(y_f32)).max()
    assert err < 5e-3, f"x3 error too large: {err}"


def test_unsupported_precision_falls_back_to_xla(setup):
    """inverse_fused_flow returns None for precision strings the kernel has
    no mode for (round-1 advisor: X6 silently ran plain bf16)."""
    model, params, h, kargs, h_proj, N, draws, rng = setup
    z = jnp.asarray(rng.normal(size=(draws * N, model.size)).astype(np.float32))
    old = model.precision
    try:
        model.precision = "BF16_BF16_F32_X6"
        assert model.inverse_fused_flow(params, z, h) is None
    finally:
        model.precision = old


def test_non_gelu_coupling_not_fusable():
    """The kernels hardcode GELU; any other activation must fail the gate
    (round-1 advisor: non-GELU configs would silently produce wrong samples)."""
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=6),
            FullyConnectedFeatureNetwork(sizes=[6, 32, 16]),
        ]
    )
    model = CondRealNVP(
        size=7, nested_sizes=[24, 24], n_blocks=4, n_conditions=16,
        feature_network_stack=stack, activation="ReLU", use_pallas=True,
    )
    assert not model.coupling.fusable
    assert not model._use_fused(train=False)


def test_structural_gate_small_configs(monkeypatch):
    """n_blocks == 1 or a single nested hidden layer cannot be stacked;
    _use_fused must route those to XLA instead of crashing."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    kw = dict(size=7, n_conditions=16, use_pallas=True,
              feature_network_stack=FeatureNetworkStack(
                  [ConcatenateCondition(input_size=None, output_size=6),
                   FullyConnectedFeatureNetwork(sizes=[6, 32, 16])]))
    assert not CondRealNVP(nested_sizes=[24, 24], n_blocks=1, **kw)._use_fused(train=False)
    assert not CondRealNVP(nested_sizes=[24], n_blocks=4, **kw)._use_fused(train=False)
    assert CondRealNVP(nested_sizes=[24, 24], n_blocks=4, **kw)._use_fused(train=False)


def test_cpu_backend_falls_back_to_xla():
    """On a non-TPU backend the fused gate must stay closed (Mosaic kernels
    can't lower on CPU), so use_pallas=True is safe everywhere."""
    kw = dict(size=7, n_conditions=16, use_pallas=True,
              feature_network_stack=FeatureNetworkStack(
                  [ConcatenateCondition(input_size=None, output_size=6),
                   FullyConnectedFeatureNetwork(sizes=[6, 32, 16])]))
    model = CondRealNVP(nested_sizes=[24, 24], n_blocks=4, **kw)
    assert jax.default_backend() == "cpu"
    assert not model._use_fused(train=False)
    # sample() must run fine through the XLA fallback
    params = model.init(jax.random.key(0))
    cond = jax.random.normal(jax.random.key(1), (4, 6))
    s = model.sample(params, jax.random.key(2), 8, cond)
    assert s.shape == (8, 4, 7) and bool(np.isfinite(np.asarray(s)).all())


def test_model_sample_uses_fused_path(setup):
    model, params, h, kargs, h_proj, N, draws, rng = setup
    cond = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
    ref = model.sample(params, jax.random.key(3), 64, cond)
    assert ref.shape == (64, N, model.size)
    # sample()'s fused path flattens draws-major; verify the same layout
    # through the kernel (interpret mode) matches the XLA inverse.
    z = jax.random.normal(jax.random.key(3), (64, N, model.size))
    y_k = fused_flow(
        z.reshape(64 * N, model.size), h_proj, **kargs,
        inverse=True, n_cond=N, block_b=64, interpret=True,
    ).reshape(64, N, model.size)
    y_ref = jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-4)


# ---------------------------------------------------------------------------
# Fused *training* forward (custom VJP) — ops/flow_kernel.py fused_flow_train
# ---------------------------------------------------------------------------


def _stacked_forward_ref(x, h_proj, kargs):
    """Pure-JAX reference of the stacked-flow forward used to validate the
    training kernel's hand-written VJP (python loop over blocks; identical
    math to `_flow_fwd_train_kernel`)."""
    n_steps = h_proj.shape[0]
    size = x.shape[-1]
    d_a = kargs["w1y"].shape[1]
    ld = jnp.zeros((x.shape[0],))
    hp = jax.lax.stop_gradient  # noqa: E731 (alias unused; kept for clarity)
    for k in range(n_steps):
        inner = k < n_steps - 1
        s_eff = kargs["an_scale"][k] if inner else jnp.ones(size)
        b_eff = kargs["an_bias"][k] if inner else jnp.zeros(size)
        x = x * s_eff + b_eff
        ld = ld + jnp.sum(jnp.log(jnp.abs(s_eff)))
        x_a = x[:, :d_a]
        a = jax.nn.gelu(x_a @ kargs["w1y"][k] + kargs["b1"][k] + h_proj[k])
        for i in range(kargs["wm"].shape[1]):
            a = jax.nn.gelu(a @ kargs["wm"][k, i] + kargs["bm"][k, i])
        out = a @ kargs["wout"][k] + kargs["bout"][k]
        d_b = size - d_a
        t = out[:, :d_b]
        s = jnp.tanh(out[:, d_b:])
        z_b = jnp.exp(s) * x[:, d_a:] + t
        ld = ld + jnp.sum(s, axis=-1)
        x = jnp.concatenate([x_a, z_b], axis=-1)
        if inner:
            x = x @ jax.lax.stop_gradient(kargs["ortho"][k])
    return x, ld


@pytest.mark.slow
def test_fused_train_forward_matches_reference(setup):
    from bcnf_tpu.ops.flow_kernel import fused_flow_train

    model, params, h, kargs, h_proj, N, draws, rng = setup
    # per-row conditions (training layout): one h row per batch row
    B = 16
    hB = jnp.asarray(rng.normal(size=(B, h.shape[-1])).astype(np.float32))
    kargsB, h_projB = model._fused_flow_args(params, hB)
    y = jnp.asarray(rng.normal(size=(B, model.size)).astype(np.float32))

    z_k, ld_k = fused_flow_train(y, h_projB, kargsB, block_b=8,
                                 precision="highest", interpret=True)
    z_r, ld_r = _stacked_forward_ref(y, h_projB, kargsB)
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(z_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_r), atol=1e-4)

    # and against the model's XLA forward (same math through the scan path)
    condB = jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32))
    h2 = model.encode(params, (condB,))
    kargs2, h_proj2 = model._fused_flow_args(params, h2)
    z_k2, ld_k2 = fused_flow_train(y, h_proj2, kargs2, block_b=8,
                                   precision="highest", interpret=True)
    with jax.default_matmul_precision("highest"):
        z_x, ld_x = model.forward(params, y, condB)
    np.testing.assert_allclose(np.asarray(z_k2), np.asarray(z_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_k2), np.asarray(ld_x), atol=1e-4)


@pytest.mark.slow
def test_fused_train_grads_match_reference(setup):
    from bcnf_tpu.ops.flow_kernel import fused_flow_train

    model, params, h, kargs, h_proj, N, draws, rng = setup
    B = 16
    hB = jnp.asarray(rng.normal(size=(B, h.shape[-1])).astype(np.float32))
    kargsB, h_projB = model._fused_flow_args(params, hB)
    y = jnp.asarray(rng.normal(size=(B, model.size)).astype(np.float32))

    def loss_k(y, h_proj, kargs):
        z, ld = fused_flow_train(y, h_proj, kargs, block_b=8,
                                 precision="highest", interpret=True)
        return jnp.mean(0.5 * jnp.sum(z**2, axis=-1) - ld)

    def loss_r(y, h_proj, kargs):
        z, ld = _stacked_forward_ref(y, h_proj, kargs)
        return jnp.mean(0.5 * jnp.sum(z**2, axis=-1) - ld)

    v_k, g_k = jax.value_and_grad(loss_k, argnums=(0, 1, 2))(y, h_projB, kargsB)
    v_r, g_r = jax.value_and_grad(loss_r, argnums=(0, 1, 2))(y, h_projB, kargsB)
    np.testing.assert_allclose(float(v_k), float(v_r), atol=1e-5)
    flat_k, tree_k = jax.tree.flatten(g_k)
    flat_r, tree_r = jax.tree.flatten(g_r)
    assert tree_k == tree_r
    for a, b, path in zip(flat_k, flat_r, jax.tree.leaves_with_path(g_k)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
            err_msg=str(path[0]),
        )
