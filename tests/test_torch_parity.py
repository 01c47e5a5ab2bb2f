"""Numerical parity vs torch for the conditioner building blocks.

The reference's conditioners are `torch.nn.LSTM` / hand-rolled MHA
(`src/bcnf/models/feature_network.py:148-260`); these tests load identical
weights into our functional ops and require matching outputs, so a reference
user gets the same encoder math on TPU.
"""

import jax.numpy as jnp
import numpy as np
import torch

from bcnf_tpu.ops.lstm import lstm_apply


def _torch_lstm_to_params(lstm: torch.nn.LSTM) -> dict:
    layers = []
    for li in range(lstm.num_layers):
        layer = {}
        for tag, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if tag == "bwd" and not lstm.bidirectional:
                continue
            layer[tag] = {
                # torch stores (4H, in) row-major; we use (in, 4H)
                "w_ih": jnp.asarray(getattr(lstm, f"weight_ih_l{li}{suffix}").detach().numpy().T),
                "w_hh": jnp.asarray(getattr(lstm, f"weight_hh_l{li}{suffix}").detach().numpy().T),
                "b_ih": jnp.asarray(getattr(lstm, f"bias_ih_l{li}{suffix}").detach().numpy()),
                "b_hh": jnp.asarray(getattr(lstm, f"bias_hh_l{li}{suffix}").detach().numpy()),
            }
        layers.append(layer)
    return {"layers": layers}


def test_lstm_matches_torch_unidirectional():
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(input_size=3, hidden_size=8, num_layers=2, batch_first=True)
    x = np.random.default_rng(1).normal(size=(4, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x))
    ours = lstm_apply(_torch_lstm_to_params(lstm), jnp.asarray(x), hidden_size=8)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-6)


def test_lstm_matches_torch_bidirectional_multilayer():
    torch.manual_seed(1)
    lstm = torch.nn.LSTM(
        input_size=5, hidden_size=7, num_layers=3, batch_first=True, bidirectional=True
    )
    x = np.random.default_rng(2).normal(size=(3, 9, 5)).astype(np.float32)
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x))
    ours = lstm_apply(_torch_lstm_to_params(lstm), jnp.asarray(x), hidden_size=7)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-6)
