"""Conditioner (feature) networks: encode raw conditions into the flow's
condition vector.

Functional JAX redesign of reference `src/bcnf/models/feature_network.py`.
Each network is a static-config object with ``init(key) -> params`` and
``apply(params, x, *, rng, train) -> features``; the stack consumes one raw
condition per `ConcatenateCondition` marker exactly like the reference
(`feature_network.py:46-69`).

Fixed reference quirks (SURVEY.md):

- Q1: `LSTMFeatureNetwork` pools over the **time** axis. The reference at HEAD
  pools over dim 0 — the batch axis (`feature_network.py:168-178`), which is
  shape-inconsistent for batch != seq_len and disagrees with its own
  `DualDomainLSTM` (`:387-392`). We pool over time.
- Q10: Transformer positional embeddings are vectorized and full-width
  (reference computes them in a Python double-loop bounded by `input_size`,
  `feature_network.py:287-297`).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from bcnf_tpu.ops.attention import (
    sinusoidal_positional_embeddings,
    transformer_block_apply,
    transformer_block_init,
)
from bcnf_tpu.ops.lstm import lstm_apply, lstm_init
from bcnf_tpu.ops.nn import (
    Params,
    dropout,
    get_activation,
    linear_apply,
    linear_init,
)


class FeatureNetwork:
    """Base: static config + pure init/apply (reference `feature_network.py:10-25`)."""

    input_size: Any = None
    output_size: Any = None

    def init(self, key: jax.Array) -> Params:
        return {}

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        raise NotImplementedError


class Identity(FeatureNetwork):
    """`None` feature-network placeholder (reference `factories.py:55-56`)."""

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return x


class ConcatenateCondition(FeatureNetwork):
    """Marker that consumes one raw condition and concatenates it to the
    current features (reference `feature_network.py:76-88`)."""

    def __init__(self, input_size: int | None = None, output_size: int | None = None, dim: int = -1) -> None:
        self.input_size = input_size
        self.output_size = output_size
        self.dim = dim

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return x


class FeatureNetworkStack(FeatureNetwork):
    """Sequential composition of feature networks (reference `feature_network.py:28-73`)."""

    def __init__(self, feature_networks: Sequence[FeatureNetwork | None] | None) -> None:
        if feature_networks is None or all(fn is None for fn in feature_networks):
            raise ValueError("Feature network stack must contain at least one feature network.")
        self.feature_networks = [fn for fn in feature_networks if fn is not None]
        self.n_distinct_conditions = sum(
            1 for fn in self.feature_networks if isinstance(fn, ConcatenateCondition)
        )
        self.input_size = self.feature_networks[0].input_size
        self.output_size = self.feature_networks[-1].output_size

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.feature_networks))
        return {"nets": [fn.init(k) for fn, k in zip(self.feature_networks, keys)]}

    def apply(self, params: Params, *conditions: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        if len(conditions) != self.n_distinct_conditions:
            raise ValueError(
                f"Expected {self.n_distinct_conditions} conditions, but got {len(conditions)}."
            )
        consume = 0
        current: jnp.ndarray | None = None
        for i, fn in enumerate(self.feature_networks):
            sub = jax.random.fold_in(rng, i) if rng is not None else None
            if isinstance(fn, ConcatenateCondition):
                if current is None:
                    current = fn.apply(params["nets"][i], conditions[consume], sub, train)
                else:
                    current = fn.apply(
                        params["nets"][i],
                        jnp.concatenate([current, conditions[consume]], axis=fn.dim),
                        sub,
                        train,
                    )
                consume += 1
            else:
                current = fn.apply(params["nets"][i], current, sub, train)
        return current


class FrExpFeatureNetwork(FeatureNetwork):
    """Mantissa/exponent split (reference `feature_network.py:91-111`)."""

    def __init__(self, input_size: int, separate_sign: bool = False) -> None:
        self.separate_sign = separate_sign
        self.input_size = input_size
        self.output_size = input_size * (2 + int(separate_sign))

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        mantissa, exponent = jnp.frexp(x)
        exponent = exponent.astype(x.dtype)
        if self.separate_sign:
            sign = jnp.sign(mantissa)
            return jnp.concatenate([sign, jnp.abs(mantissa), exponent], axis=-1)
        return jnp.concatenate([mantissa, exponent], axis=-1)


class FullyConnectedFeatureNetwork(FeatureNetwork):
    """MLP over flattened input (reference `feature_network.py:114-145`).

    ``flatten=False`` applies the MLP over the last axis only (per-frame),
    expressing the reference's *legacy* two-stage schema — a per-frame
    ``feature_network`` feeding a ``time_series_network`` (e.g.
    `configs/runs/dev/trajectory_LSTM_large_pretrained.yaml`) — inside the
    modern feature_networks stack.
    """

    def __init__(
        self,
        sizes: Sequence[int],
        activation: str = "GELU",
        dropout: float = 0.0,
        batch_norm: bool = False,
        flatten: bool = True,
    ) -> None:
        if batch_norm:
            raise NotImplementedError(
                "batch_norm is unused by all reference run configs and is not supported"
            )
        self.sizes = list(sizes)
        self.input_size = self.sizes[0]
        self.output_size = self.sizes[-1]
        self.act = get_activation(activation if isinstance(activation, str) else "GELU")
        self.dropout_rate = dropout
        self.flatten = flatten

    def init(self, key: jax.Array) -> Params:
        if len(self.sizes) < 2:
            return {"layers": []}
        keys = jax.random.split(key, len(self.sizes) - 1)
        return {
            "layers": [
                linear_init(k, self.sizes[i], self.sizes[i + 1]) for i, k in enumerate(keys)
            ]
        }

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        if self.flatten:
            x = x.reshape(x.shape[0], -1)  # flatten (reference `:144`)
        layers = params["layers"]
        if not layers:
            return x
        for i, p in enumerate(layers[:-1]):
            x = self.act(linear_apply(p, x))
            if self.dropout_rate > 0:
                sub = jax.random.fold_in(rng, i) if rng is not None else None
                x = dropout(sub, x, self.dropout_rate, train)
        return linear_apply(layers[-1], x)


class LSTMFeatureNetwork(FeatureNetwork):
    """LSTM encoder with linear head + time pooling (reference `feature_network.py:148-178`).

    SURVEY.md Q1 fix: pooling is over the time axis (dim=1), not the batch.
    """

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        output_size: int,
        num_layers: int,
        dropout: float = 0.0,
        bidirectional: bool = False,
        pooling: str = "mean",
    ) -> None:
        if pooling not in ("mean", "max"):
            raise ValueError(f'Pooling method {pooling} not supported. Use either "mean" or "max".')
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.dropout_rate = dropout
        self.bidirectional = bidirectional
        self.pooling = pooling

    def init(self, key: jax.Array) -> Params:
        kl, ko = jax.random.split(key)
        dirs = 2 if self.bidirectional else 1
        return {
            "lstm": lstm_init(kl, self.input_size, self.hidden_size, self.num_layers, self.bidirectional),
            "linear": linear_init(ko, self.hidden_size * dirs, self.output_size),
        }

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        h = lstm_apply(
            params["lstm"], x, self.hidden_size, self.dropout_rate, rng, train
        )  # (B, T, H*dirs)
        h = linear_apply(params["linear"], h)  # (B, T, out)
        if self.pooling == "mean":
            return h.mean(axis=1)
        return h.max(axis=1)


class Transformer(FeatureNetwork):
    """Transformer encoder with first-token readout (reference `feature_network.py:263-307`)."""

    def __init__(
        self,
        input_size: int,
        trf_size: int,
        n_heads: int,
        ff_size: int,
        n_blocks: int,
        output_size: int,
        dropout: float = 0.5,
        trf_dropout: float = 0.1,
        add_positional_embeddings: bool = False,
    ) -> None:
        self.input_size = input_size
        self.output_size = output_size
        self.trf_size = trf_size
        self.n_heads = n_heads
        self.ff_size = ff_size
        self.n_blocks = n_blocks
        self.dropout_rate = dropout
        self.trf_dropout = trf_dropout
        self.add_positional_embeddings = add_positional_embeddings

    def init(self, key: jax.Array) -> Params:
        ke, ko, kb = jax.random.split(key, 3)
        block_keys = jax.random.split(kb, self.n_blocks)
        return {
            "embed": linear_init(ke, self.input_size, self.trf_size),
            "blocks": [
                transformer_block_init(k, self.trf_size, self.ff_size, self.n_heads)
                for k in block_keys
            ],
            "out": linear_init(ko, self.trf_size, self.output_size),
        }

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        r0 = r1 = None
        if rng is not None:
            r0, r1, rng = jax.random.split(rng, 3)
        x = linear_apply(params["embed"], x)
        x = dropout(r0, x, self.dropout_rate, train)
        if self.add_positional_embeddings:
            pe = sinusoidal_positional_embeddings(x.shape[1], self.trf_size, x.dtype)
            x = x + pe[None]
        for i, blk in enumerate(params["blocks"]):
            sub = jax.random.fold_in(rng, i) if rng is not None else None
            x = transformer_block_apply(blk, x, self.n_heads, self.trf_dropout, sub, train)
        x = dropout(r1, x, self.dropout_rate, train)
        return linear_apply(params["out"], x[:, 0, :])  # first-token readout (`:305`)


class VerboseLSTM(FeatureNetwork):
    """Per-layer LSTM stack that also exposes every layer's hidden states
    (reference `feature_network.py:310-348`).

    The reference builds `num_layers` single-layer ``nn.LSTM`` modules with
    inter-layer dropout and returns ``(x, h)`` where ``h`` stacks each layer's
    full output sequence, shape ``(B, num_layers, T, H*dirs)``. Here ``apply``
    returns the final layer's sequence (the value consumed downstream) and
    ``apply_verbose`` returns the ``(x, h)`` pair.
    """

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        num_layers: int,
        dropout: float = 0.0,
        bidirectional: bool = False,
    ) -> None:
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.dropout_rate = dropout
        self.bidirectional = bidirectional
        dirs = 2 if bidirectional else 1
        self.output_size = hidden_size * dirs

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.num_layers)
        dirs = 2 if self.bidirectional else 1
        in_sizes = [self.input_size] + [self.hidden_size * dirs] * (self.num_layers - 1)
        return {
            "layers": [
                lstm_init(k, in_size, self.hidden_size, 1, self.bidirectional)
                for k, in_size in zip(keys, in_sizes)
            ]
        }

    def apply_verbose(
        self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        hs = []
        for i, layer in enumerate(params["layers"]):
            x = lstm_apply(layer, x, self.hidden_size, 0.0, None, False)
            hs.append(x)
            if self.dropout_rate > 0 and i < self.num_layers - 1:
                sub = jax.random.fold_in(rng, i) if rng is not None else None
                x = dropout(sub, x, self.dropout_rate, train)
        return x, jnp.stack(hs, axis=1)  # (B, L, T, H*dirs), reference `:347`

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return self.apply_verbose(params, x, rng, train)[0]


class DualDomainLSTM(FeatureNetwork):
    """Time-LSTM + rfft->frequency-LSTM, pooled and fused by an MLP
    (reference `feature_network.py:350-398`)."""

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        fc_sizes: Sequence[int],
        fc_dropout: float = 0.0,
        num_layers: int = 1,
        dropout: float = 0.0,
        bidirectional: bool = False,
        pooling: str = "mean",
    ) -> None:
        if pooling not in ("mean", "max"):
            raise ValueError(f"Invalid pooling method: {pooling}")
        self.input_size = input_size
        self.output_size = list(fc_sizes)[-1]
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.dropout_rate = dropout
        self.bidirectional = bidirectional
        self.pooling = pooling
        dirs = 2 if bidirectional else 1
        self.fc = FullyConnectedFeatureNetwork(
            sizes=[hidden_size * dirs * 2] + list(fc_sizes), dropout=fc_dropout
        )

    def init(self, key: jax.Array) -> Params:
        kt, kf, kc = jax.random.split(key, 3)
        return {
            "time": lstm_init(kt, self.input_size, self.hidden_size, self.num_layers, self.bidirectional),
            "freq": lstm_init(kf, self.input_size * 2, self.hidden_size, self.num_layers, self.bidirectional),
            "fc": self.fc.init(kc),
        }

    def _pool(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.mean(axis=1) if self.pooling == "mean" else x.max(axis=1)

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        rt = rf = rc = None
        if rng is not None:
            rt, rf, rc = jax.random.split(rng, 3)
        h_time = lstm_apply(params["time"], x, self.hidden_size, self.dropout_rate, rt, train)
        f = jnp.fft.rfft(x, axis=1)  # FFT over time (reference `:383`)
        h_freq = lstm_apply(
            params["freq"],
            jnp.concatenate([f.real, f.imag], axis=-1),
            self.hidden_size,
            self.dropout_rate,
            rf,
            train,
        )
        fused = jnp.concatenate([self._pool(h_time), self._pool(h_freq)], axis=-1)
        return self.fc.apply(params["fc"], fused, rc, train)


class DualDomainTransformer(FeatureNetwork):
    """Time + frequency transformers fused by an MLP (reference `feature_network.py:401-471`)."""

    def __init__(
        self,
        input_size: int,
        trf_size: int,
        n_heads: int,
        ff_size: int,
        n_blocks: int,
        fc_sizes: Sequence[int],
        fc_dropout: float = 0.5,
        trf_dropout: float = 0.1,
        dropout: float = 0.5,
        add_positional_embeddings: bool = False,
    ) -> None:
        self.input_size = input_size
        self.output_size = list(fc_sizes)[-1]
        common = dict(
            trf_size=trf_size, n_heads=n_heads, ff_size=ff_size, n_blocks=n_blocks,
            output_size=trf_size, dropout=dropout, trf_dropout=trf_dropout,
            add_positional_embeddings=add_positional_embeddings,
        )
        self.time_trf = Transformer(input_size=input_size, **common)
        self.freq_trf = Transformer(input_size=input_size * 2, **common)
        self.fc = FullyConnectedFeatureNetwork(sizes=[trf_size * 2] + list(fc_sizes), dropout=fc_dropout)

    def init(self, key: jax.Array) -> Params:
        kt, kf, kc = jax.random.split(key, 3)
        return {
            "time": self.time_trf.init(kt),
            "freq": self.freq_trf.init(kf),
            "fc": self.fc.init(kc),
        }

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        rt = rf = rc = None
        if rng is not None:
            rt, rf, rc = jax.random.split(rng, 3)
        x_time = self.time_trf.apply(params["time"], x, rt, train)
        f = jnp.fft.rfft(x, axis=1)
        x_freq = self.freq_trf.apply(
            params["freq"], jnp.concatenate([f.real, f.imag], axis=-1), rf, train
        )
        return self.fc.apply(params["fc"], jnp.concatenate([x_time, x_freq], axis=-1), rc, train)


class DualDomainFC(FeatureNetwork):
    """Time + frequency MLPs fused by an MLP (reference `feature_network.py:474-525`).

    Deliberate divergences (the reference is un-runnable as written for every
    published DFC config, e.g. `configs/runs/hybrid/t_DFC_large_hybrid.yaml`):

    - The reference declares the frequency MLP input as ``input_size * 2``
      (`feature_network.py:496-499`) but actually feeds it
      ``(T//2+1) * 2 * C`` rfft features — a shape mismatch. We compute the
      **full** FFT over the flattened input, whose concat(real, imag) is
      exactly ``input_size * 2`` features: the declared parameter shapes hold
      and no information is lost (the full FFT is a superset of the rfft).
    - The reference declares the fusion MLP input as ``input_size * 2``
      (`feature_network.py:502-504`) but feeds it ``2 * sizes[-1]`` features.
      We size it from the actual concatenation.
    """

    def __init__(
        self,
        input_size: int,
        sizes: Sequence[int],
        fc_sizes: Sequence[int],
        dropout: float = 0.5,
        add_positional_embeddings: bool = False,
    ) -> None:
        self.input_size = input_size
        self.output_size = list(fc_sizes)[-1]
        self.time_fc = FullyConnectedFeatureNetwork(sizes=[input_size] + list(sizes), dropout=dropout)
        self.freq_fc = FullyConnectedFeatureNetwork(sizes=[input_size * 2] + list(sizes), dropout=dropout)
        self.fc = FullyConnectedFeatureNetwork(
            sizes=[2 * list(sizes)[-1]] + list(fc_sizes), dropout=dropout
        )

    def init(self, key: jax.Array) -> Params:
        kt, kf, kc = jax.random.split(key, 3)
        return {
            "time": self.time_fc.init(kt),
            "freq": self.freq_fc.init(kf),
            "fc": self.fc.init(kc),
        }

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        rt = rf = rc = None
        if rng is not None:
            rt, rf, rc = jax.random.split(rng, 3)
        x_time = self.time_fc.apply(params["time"], x, rt, train)
        flat = x.reshape(x.shape[0], -1)
        f = jnp.fft.fft(flat, axis=-1)  # full FFT: 2*input_size real features
        x_freq = self.freq_fc.apply(
            params["freq"], jnp.concatenate([f.real, f.imag], axis=-1), rf, train
        )
        return self.fc.apply(params["fc"], jnp.concatenate([x_time, x_freq], axis=-1), rc, train)
