"""Named custom layers + VerboseLSTM (reference `src/bcnf/models/layers.py`,
`feature_network.py:310-348`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from bcnf_tpu.factories import FeatureNetworkFactory
from bcnf_tpu.models import (
    AnyGLU,
    FFTEnrichLayer,
    FFTLayer,
    LinearFFTEnriched,
    VerboseLSTM,
)


def test_fft_layer_matches_torch_forward_norm():
    x = np.random.default_rng(0).normal(size=(4, 10)).astype(np.float32)
    ours = FFTLayer(input_size=10).apply({}, jnp.asarray(x))
    f = torch.fft.rfft(torch.from_numpy(x), dim=-1, norm="forward")
    theirs = torch.cat([f.real, f.imag], dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)
    assert ours.shape == (4, 2 * (10 // 2 + 1))


def test_fft_enrich_layer_shape():
    layer = FFTEnrichLayer(input_size=10)
    out = layer.apply({}, jnp.ones((3, 10)))
    assert out.shape == (3, layer.output_size)
    np.testing.assert_allclose(np.asarray(out[:, :10]), 1.0)


def test_anyglu_is_value_times_gated_activation():
    layer = AnyGLU(input_size=6, output_size=5, activation="Sigmoid")
    params = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 6)).astype(np.float32))
    out = layer.apply(params, x)
    v = x @ params["value"]["w"] + params["value"]["b"]
    g = x @ params["gate"]["w"] + params["gate"]["b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(v * jax.nn.sigmoid(g)), atol=1e-6)


def test_linear_fft_enriched_shapes():
    layer = LinearFFTEnriched(input_size=10, output_size=7)
    params = layer.init(jax.random.PRNGKey(0))
    out = layer.apply(params, jnp.ones((3, 10)))
    assert out.shape == (3, 7)
    # weight covers [x, rfft(x)] = in + 2*(in//2+1) features (reference layers.py:71)
    assert params["w"].shape[0] == 10 + 2 * (10 // 2 + 1)


def test_verbose_lstm_shapes_and_layer_stack():
    net = VerboseLSTM(input_size=3, hidden_size=8, num_layers=3, bidirectional=True)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 11, 3)).astype(np.float32))
    final, h = net.apply_verbose(params, x)
    assert final.shape == (4, 11, 16)
    assert h.shape == (4, 3, 11, 16)  # (B, L, T, H*dirs), reference :347
    np.testing.assert_allclose(np.asarray(h[:, -1]), np.asarray(final), atol=1e-6)
    assert net.apply(params, x).shape == (4, 11, 16)


def test_factory_resolves_new_networks():
    for name, kwargs in [
        ("VerboseLSTM", {"input_size": 3, "hidden_size": 4, "num_layers": 2}),
        ("AnyGLU", {"input_size": 4, "output_size": 4}),
        ("FFTLayer", {"input_size": 8}),
        ("FFTEnrichLayer", {"input_size": 8}),
        ("LinearFFTEnriched", {"input_size": 8, "output_size": 4}),
    ]:
        net = FeatureNetworkFactory.get_feature_network(name, kwargs)
        assert net is not None
