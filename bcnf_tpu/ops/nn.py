"""Functional NN building blocks (dense layers, activations, dropout).

These are the TPU-native replacements for the reference's `torch.nn` layers
resolved by `LayerFactory` (reference `src/bcnf/factories.py:61-73`) and the
custom layers in reference `src/bcnf/models/layers.py` (`AnyGLU`, `FFTLayer`,
`FFTEnrichLayer`, `LinearFFTEnriched`).

Everything is a pure function over pytree params. Weight init matches torch's
`nn.Linear` default (U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so training dynamics
are comparable to the reference.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict


# ---------------------------------------------------------------------------
# Activations (reference resolves these by name from torch.nn,
# `src/bcnf/factories.py:63-65`)
# ---------------------------------------------------------------------------

ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "GELU": jax.nn.gelu,
    "RELU": jax.nn.relu,
    "SILU": jax.nn.silu,
    "SIGMOID": jax.nn.sigmoid,
    "TANH": jnp.tanh,
    "ELU": jax.nn.elu,
    "LEAKYRELU": jax.nn.leaky_relu,
    "SOFTPLUS": jax.nn.softplus,
    "MISH": jax.nn.mish,
    "IDENTITY": lambda x: x,
}


def get_activation(name: str, **kwargs: Any) -> Callable[[jnp.ndarray], jnp.ndarray]:
    key = name.upper()
    if key not in ACTIVATIONS:
        raise NotImplementedError(f"Activation {name} not implemented")
    fn = ACTIVATIONS[key]
    if kwargs:
        return lambda x: fn(x, **kwargs)
    return fn


# ---------------------------------------------------------------------------
# Dense / linear
# ---------------------------------------------------------------------------


def linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype: Any = jnp.float32) -> Params:
    """torch.nn.Linear default init: U(-k, k) with k = 1/sqrt(fan_in)."""
    k = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype=jnp.float32))
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (in_dim, out_dim), dtype, -k, k),
        "b": jax.random.uniform(bk, (out_dim,), dtype, -k, k),
    }


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def dropout(key: jax.Array | None, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# FFT layers (reference `src/bcnf/models/layers.py:34-78`)
# ---------------------------------------------------------------------------


def fft_features(x: jnp.ndarray) -> jnp.ndarray:
    """rfft over the feature axis with 'forward' norm; concat(real, imag)
    (reference `src/bcnf/models/layers.py:42-45`)."""
    f = jnp.fft.rfft(x, axis=-1, norm="forward")
    return jnp.concatenate([f.real, f.imag], axis=-1)


def fft_enrich(x: jnp.ndarray) -> jnp.ndarray:
    """Concatenate the input with its FFT (reference `layers.py:48-58`)."""
    return jnp.concatenate([x, fft_features(x)], axis=-1)


# ---------------------------------------------------------------------------
# Parametric layer registry ("Linear", "AnyGLU", "LinearFFTEnriched", ...)
# selectable through `model.kwargs.layer` in run configs, e.g.
# reference `configs/runs/dev/trajectory_LSTM_FFT_large_small_cond.yaml:34`.
# ---------------------------------------------------------------------------


class DenseLayer:
    """A named dense-layer family: init(key, in, out) + apply(params, x)."""

    def __init__(self, name: str, init: Callable, apply: Callable) -> None:
        self.name = name
        self.init = init
        self.apply = apply


def _anyglu_init(activation: str, activation_kwargs: dict | None) -> Callable:
    def init(key: jax.Array, in_dim: int, out_dim: int, dtype: Any = jnp.float32) -> Params:
        kg, kv = jax.random.split(key)
        return {
            "gate": linear_init(kg, in_dim, out_dim, dtype),
            "value": linear_init(kv, in_dim, out_dim, dtype),
        }

    return init


def _anyglu_apply(activation: str, activation_kwargs: dict | None) -> Callable:
    act = get_activation(activation, **(activation_kwargs or {}))

    def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
        # value * act(gate) (reference `src/bcnf/models/layers.py:31`)
        return linear_apply(params["value"], x) * act(linear_apply(params["gate"], x))

    return apply


def _linear_fft_init(key: jax.Array, in_dim: int, out_dim: int, dtype: Any = jnp.float32) -> Params:
    enriched = in_dim + 2 * (in_dim // 2 + 1)  # reference `layers.py:71`
    return linear_init(key, enriched, out_dim, dtype)


def _linear_fft_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear_apply(params, fft_enrich(x))


def get_dense_layer(
    layer: str,
    layer_kwargs: dict | None = None,
) -> DenseLayer:
    """Resolve a dense-layer family by config name (reference `factories.py:61-73`)."""
    kwargs = layer_kwargs or {}
    name = layer.lower()
    if name == "linear":
        return DenseLayer("Linear", linear_init, linear_apply)
    if name == "anyglu":
        act = kwargs.get("activation", "GELU")
        act_kwargs = kwargs.get("activation_kwargs")
        layer_obj = DenseLayer("AnyGLU", _anyglu_init(act, act_kwargs), _anyglu_apply(act, act_kwargs))
        layer_obj.glu_act = get_activation(act, **(act_kwargs or {}))
        return layer_obj
    if name == "linearfftenriched":
        return DenseLayer("LinearFFTEnriched", _linear_fft_init, _linear_fft_apply)
    raise NotImplementedError(f"Layer {layer} not implemented")


# ---------------------------------------------------------------------------
# LayerNorm (for the Transformer conditioner)
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int, dtype: Any = jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm_apply(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    return xhat * params["scale"] + params["bias"]
