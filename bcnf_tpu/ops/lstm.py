"""LSTM for TPU: `lax.scan` over time with batched gate matmuls.

Replaces the reference's cuDNN-fused `nn.LSTM`
(`src/bcnf/models/feature_network.py:155`). TPU has no cuDNN RNN kernels; the
idiomatic design (SURVEY.md section 7.3 "LSTM on TPU") is:

- the input projection ``x @ W_ih`` for *all* timesteps is computed as one
  large MXU matmul before the scan (hoisting 4H*T work out of the recurrence),
- the scan body then does a single `(B, H) @ (H, 4H)` matmul per step,
- bidirectional runs a second scan over the reversed sequence.

Gate order and init match torch (`i, f, g, o`; U(-1/sqrt(H), 1/sqrt(H))) so
configurations transfer 1:1.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from bcnf_tpu.ops.nn import Params, dropout


def _fused_enabled() -> bool:
    """Gate for the fused Pallas recurrence (ops/lstm_kernel.py).

    Decided OFF by measurement (results/lstm_kernel_bench.json, 1x v5e,
    flagship encoder T=30 H=140): the kernel wins only +13%/+5% (fwd/grad)
    at B=256, loses at B=1024, and its backward exceeds the scoped-VMEM
    limit at B>=1024. The scan path (hoisted input projection + one MXU
    matmul per step) is the production path; the kernel stays in
    ops/lstm_kernel.py as documented, tested research code reachable via
    BCNF_FUSED_LSTM=1 for experiments only.
    """
    return os.environ.get("BCNF_FUSED_LSTM", "0") == "1"


def lstm_cell_init(key: jax.Array, input_size: int, hidden_size: int, dtype: Any = jnp.float32) -> Params:
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, dtype=jnp.float32))
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return {
        "w_ih": u(ks[0], (input_size, 4 * hidden_size)),
        "w_hh": u(ks[1], (hidden_size, 4 * hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def _direction_scan(params: Params, x: jnp.ndarray, hidden_size: int, reverse: bool) -> jnp.ndarray:
    """Run one direction over `(B, T, F)`; returns `(B, T, H)`."""
    B = x.shape[0]
    # Hoist the input projection out of the recurrence: one big MXU matmul.
    x_proj = x @ params["w_ih"] + params["b_ih"] + params["b_hh"]  # (B, T, 4H)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) for scan
    h0 = jnp.zeros((B, hidden_size), x.dtype)
    c0 = jnp.zeros((B, hidden_size), x.dtype)

    def step(carry: tuple, xp: jnp.ndarray) -> tuple:
        h, c = carry
        gates = xp + h @ params["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), x_proj, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


def _direction(params: Params, x: jnp.ndarray, hidden_size: int, reverse: bool) -> jnp.ndarray:
    """One LSTM direction; routes to the fused Pallas recurrence when enabled
    (and the batch tiles), else the `lax.scan` path."""
    if _fused_enabled():
        from bcnf_tpu.ops.lstm_kernel import fused_direction

        out = fused_direction(params, x, hidden_size, reverse)
        if out is not None:
            return out
    return _direction_scan(params, x, hidden_size, reverse)


def lstm_init(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = False,
    dtype: Any = jnp.float32,
) -> Params:
    """Multi-layer (optionally bidirectional) LSTM parameters."""
    layers = []
    in_dim = input_size
    for li in range(num_layers):
        key, kf, kb = jax.random.split(key, 3)
        layer = {"fwd": lstm_cell_init(kf, in_dim, hidden_size, dtype)}
        if bidirectional:
            layer["bwd"] = lstm_cell_init(kb, in_dim, hidden_size, dtype)
        layers.append(layer)
        in_dim = hidden_size * (2 if bidirectional else 1)
    return {"layers": layers}


def lstm_apply(
    params: Params,
    x: jnp.ndarray,
    hidden_size: int,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    train: bool = False,
    return_all_layers: bool = False,
) -> jnp.ndarray | tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Apply the LSTM to `(B, T, F)`; returns `(B, T, H*dirs)`.

    Inter-layer dropout matches torch `nn.LSTM(dropout=...)`: applied to the
    output of every layer except the last. With ``return_all_layers=True`` the
    per-layer hidden sequences are also returned (reference `VerboseLSTM`,
    `src/bcnf/models/feature_network.py:310-347`).
    """
    all_layers = []
    n = len(params["layers"])
    for li, layer in enumerate(params["layers"]):
        out = _direction(layer["fwd"], x, hidden_size, reverse=False)
        if "bwd" in layer:
            back = _direction(layer["bwd"], x, hidden_size, reverse=True)
            out = jnp.concatenate([out, back], axis=-1)
        all_layers.append(out)
        if li < n - 1 and dropout_rate > 0.0:
            sub = jax.random.fold_in(rng, li) if rng is not None else None
            out = dropout(sub, out, dropout_rate, train)
        x = out
    if return_all_layers:
        return x, all_layers
    return x
