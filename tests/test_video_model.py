"""End-to-end video-model pipeline: render -> CNN -> LSTM -> metadata concat -> flow.

Mirrors the reference's `videos_CNN_LSTM_large` architecture
(`configs/runs/dev/videos_CNN_LSTM_large.yaml`: a 4-stage feature stack
consuming two condition groups) at toy sizes.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bcnf_tpu.models import (
    CNN,
    ConcatenateCondition,
    CondRealNVP,
    FeatureNetworkStack,
    LSTMFeatureNetwork,
)


def _video_model(n_meta=7):
    lstm_out = 24
    stack = FeatureNetworkStack(
        [
            ConcatenateCondition(input_size=None, output_size=(18, 32)),
            CNN(
                hidden_channels=[4, 8],
                kernel_sizes=[3, 3],
                strides=[1, 1],
                output_size_lin=16,
                output_size=16,
                image_input_size=(18, 32),
                dropout_prob=0.2,
                num_CNN=1,
            ),
            LSTMFeatureNetwork(
                input_size=16, hidden_size=8, output_size=lstm_out, num_layers=1,
            ),
            ConcatenateCondition(input_size=lstm_out, output_size=lstm_out + n_meta, dim=-1),
        ]
    )
    return CondRealNVP(
        size=19, nested_sizes=[16], n_blocks=2, n_conditions=lstm_out + n_meta,
        feature_network_stack=stack, act_norm=True, random_state=0,
    )


@pytest.mark.slow
def test_video_model_forward_and_inverse():
    model = _video_model()
    model.verify()
    params = model.init(jax.random.key(0))
    B, cams, T = 2, 2, 4
    videos = jax.random.uniform(jax.random.key(1), (B, cams, T, 18, 32))
    meta = jax.random.normal(jax.random.key(2), (B, 7))
    y = jax.random.normal(jax.random.key(3), (B, 19))
    z, ld, h = model.forward(params, y, videos, meta, return_features=True)
    assert z.shape == (B, 19) and h.shape == (B, 31)
    y_rec = model.inverse(params, z, videos, meta)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=1e-4)


def test_video_model_trains():
    import optax

    from bcnf_tpu.utils.misc import inn_nll_loss

    model = _video_model()
    params = model.init(jax.random.key(0))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    B = 4
    videos = jax.random.uniform(jax.random.key(1), (B, 2, 4, 18, 32))
    meta = jax.random.normal(jax.random.key(2), (B, 7))
    y = jax.random.normal(jax.random.key(3), (B, 19))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            z, ld = model.forward(p, y, videos, meta)
            return inn_nll_loss(z, ld)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_cnn_feature_shapes_match_plan():
    cnn = CNN(
        hidden_channels=[4, 8], kernel_sizes=[3, 3], strides=[1, 1],
        output_size_lin=16, output_size=16, image_input_size=(18, 32), num_CNN=2,
    )
    params = cnn.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (3, 2, 5, 18, 32))
    out = cnn.apply(params, x)
    assert out.shape == (3, 5, 16)


def test_conv_im2col_matches_conv_general():
    """The im2col formulation (compile-time fix for the TPU conv emitter,
    docs/PERF.md) is mathematically identical to lax.conv_general_dilated
    for every layer shape of the videos_CNN_LSTM_large plan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bcnf_tpu.models.cnn import _conv_im2col

    rng = np.random.default_rng(0)
    for c_in, c_out, k, s, pad, h, w in [
        (1, 8, 8, 1, (3, 3), 90, 160),
        (8, 16, 5, 1, (3, 3), 44, 79),
        (16, 32, 3, 2, (2, 2), 23, 40),
    ]:
        x = jnp.asarray(rng.normal(size=(4, c_in, h, w)), jnp.float32)
        wt = jnp.asarray(rng.normal(size=(c_out, c_in, k, k)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, wt, (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        out = _conv_im2col(x, wt, s, pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

        # gradients agree too (the backward is where the emitter pathology was)
        g_ref = jax.grad(lambda wt: jnp.sum(jax.lax.conv_general_dilated(
            x, wt, (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW")) ** 2))(wt)
        g_out = jax.grad(lambda wt: jnp.sum(_conv_im2col(x, wt, s, pad) ** 2))(wt)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-2)


def test_conv_train_and_inference_paths_agree():
    """`_conv_apply(train=False)` (plain XLA conv, memory-light) must equal
    the training path's im2col formulation (compile-time fix) exactly."""
    from bcnf_tpu.models.cnn import _conv_apply, _conv_init

    p = _conv_init(jax.random.key(0), 1, 4, 5)
    x = jax.random.normal(jax.random.key(1), (3, 1, 20, 24))
    a = _conv_apply(p, x, 1, (2, 2), train=True)
    b = _conv_apply(p, x, 1, (2, 2), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
