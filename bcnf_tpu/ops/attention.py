"""Multi-head attention + post-norm transformer block.

Replaces the reference's hand-rolled `MultiHeadAttention` / `TransformerBlock`
(`src/bcnf/models/feature_network.py:183-261`). Sequences here are T ~ 30-60
frames (SURVEY.md section 5.7), so plain XLA attention is already
speed-of-light — no flash/ring attention needed; the matmuls are shaped for
the MXU with a fused qkv projection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from bcnf_tpu.ops.nn import (
    Params,
    dropout,
    get_activation,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
)


def mha_init(key: jax.Array, d_model: int, n_heads: int = 1, dtype: Any = jnp.float32) -> Params:
    # Project to n_heads * head_dim (= d_model when divisible). The reference
    # projects d_model -> d_model then `.view(B, -1, n_heads, head_dim)`
    # (`feature_network.py:208-211`), which raises at runtime whenever
    # n_heads does not divide d_model (published configs t_PTRF_small
    # [trf_size 46, 4 heads] and t_DPTRF_medium [70, 8] hit this).
    # Deliberate divergence: size the projections so every config runs.
    inner = n_heads * (d_model // n_heads)
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": linear_init(kq, d_model, inner, dtype),
        "k": linear_init(kk, d_model, inner, dtype),
        "v": linear_init(kv, d_model, inner, dtype),
        "out": linear_init(ko, inner, d_model, dtype),
    }


def mha_apply(params: Params, x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Self-attention over `(B, T, D)` (reference `feature_network.py:203-229`)."""
    B, T, D = x.shape
    head_dim = D // n_heads

    def split_heads(h: jnp.ndarray) -> jnp.ndarray:
        return h.reshape(B, T, n_heads, head_dim).transpose(0, 2, 1, 3)

    q = split_heads(linear_apply(params["q"], x))
    k = split_heads(linear_apply(params["k"], x))
    v = split_heads(linear_apply(params["v"], x))

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(head_dim, x.dtype))
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, n_heads * head_dim)
    return linear_apply(params["out"], out)


def transformer_block_init(
    key: jax.Array, d_model: int, ff_size: int, n_heads: int = 1, dtype: Any = jnp.float32
) -> Params:
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "attn": mha_init(ka, d_model, n_heads, dtype),
        "norm1": layer_norm_init(d_model, dtype),
        "norm2": layer_norm_init(d_model, dtype),
        "ff1": linear_init(k1, d_model, ff_size, dtype),
        "ff2": linear_init(k2, ff_size, d_model, dtype),
    }


def transformer_block_apply(
    params: Params,
    x: jnp.ndarray,
    n_heads: int,
    dropout_rate: float = 0.1,
    rng: jax.Array | None = None,
    train: bool = False,
) -> jnp.ndarray:
    """Post-norm block: `norm(x + drop(attn)); norm(x + drop(ffn))`
    (reference `feature_network.py:255-260`)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    attn = mha_apply(params["attn"], x, n_heads)
    x = layer_norm_apply(params["norm1"], x + dropout(r1, attn, dropout_rate, train))
    ff = linear_apply(params["ff2"], get_activation("GELU")(linear_apply(params["ff1"], x)))
    x = layer_norm_apply(params["norm2"], x + dropout(r2, ff, dropout_rate, train))
    return x


def sinusoidal_positional_embeddings(seq_len: int, dim: int, dtype: Any = jnp.float32) -> jnp.ndarray:
    """Vectorized sinusoidal PE over the full width.

    SURVEY.md Q10: the reference computes PE in a Python double-loop bounded by
    `input_size` instead of `trf_size` (`feature_network.py:287-297`), so only
    the first `input_size` channels receive PE. We default to full-width
    vectorized PE (documented divergence); pass the result through
    `pe[:, :input_size_pad]`-style masking to reproduce the quirk if needed.
    """
    pos = jnp.arange(seq_len, dtype=dtype)[:, None]
    j = jnp.arange(dim, dtype=dtype)[None, :]
    angle = pos / jnp.power(10000.0, 2.0 * j / dim)
    return jnp.where((jnp.arange(dim) % 2 == 0)[None, :], jnp.sin(angle), jnp.cos(angle))
