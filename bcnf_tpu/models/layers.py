"""Named custom layers selectable via config (reference `src/bcnf/models/layers.py`).

These are thin FeatureNetwork-style wrappers over the functional dense-layer
families in `bcnf_tpu.ops.nn` so the reference's exported layer classes
(`AnyGLU`, `FFTLayer`, `FFTEnrichLayer`, `LinearFFTEnriched`) exist by name
and can be used both standalone (in feature stacks) and — via
`ops.nn.get_dense_layer` — as the coupling-MLP layer family
(`model.kwargs.layer`, e.g. reference
`configs/runs/dev/trajectory_LSTM_FFT_large_small_cond.yaml:34`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from bcnf_tpu.models.feature_network import FeatureNetwork
from bcnf_tpu.ops.nn import (
    Params,
    fft_enrich,
    fft_features,
    get_dense_layer,
)


class AnyGLU(FeatureNetwork):
    """Gated linear unit with a configurable gate activation:
    ``value(x) * act(gate(x))`` (reference `layers.py:9-31`)."""

    def __init__(
        self,
        input_size: int,
        output_size: int,
        activation: str = "GELU",
        activation_kwargs: dict[str, Any] | None = None,
    ) -> None:
        self.input_size = input_size
        self.output_size = output_size
        self._family = get_dense_layer(
            "AnyGLU", {"activation": activation, "activation_kwargs": activation_kwargs}
        )

    def init(self, key: jax.Array) -> Params:
        return self._family.init(key, self.input_size, self.output_size)

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return self._family.apply(params, x)


class FFTLayer(FeatureNetwork):
    """rfft over the last axis, real/imag concatenated (reference `layers.py:34-45`).

    Uses 'forward' normalization (1/n) to match `torch.fft.rfft(norm='forward')`.
    """

    def __init__(self, input_size: int | None = None) -> None:
        self.input_size = input_size
        self.output_size = 2 * (input_size // 2 + 1) if input_size else None

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return fft_features(x)


class FFTEnrichLayer(FeatureNetwork):
    """Concatenate the input with its FFT features (reference `layers.py:48-57`)."""

    def __init__(self, input_size: int | None = None) -> None:
        self.input_size = input_size
        self.output_size = input_size + 2 * (input_size // 2 + 1) if input_size else None

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return fft_enrich(x)


class LinearFFTEnriched(FeatureNetwork):
    """Linear layer over ``[x, rfft(x)]`` (reference `layers.py:60-78`)."""

    def __init__(self, input_size: int, output_size: int) -> None:
        self.input_size = input_size
        self.output_size = output_size
        self._family = get_dense_layer("LinearFFTEnriched")

    def init(self, key: jax.Array) -> Params:
        return self._family.init(key, self.input_size, self.output_size)

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        return self._family.apply(params, x)
