"""Pallas TPU kernel: fused affine-coupling transform.

The flow's hot sequential chain is, per coupling (reference shapes from
`configs/runs/old/trajectory_LSTM_large.yaml`): a 5-layer ~526-wide MLP over
the half-input (plus the precomputed condition projection), then
split -> tanh -> exp -> affine -> log-det row-sum (reference
`src/bcnf/models/cnf.py:98-196`). Under plain XLA each matmul is a separate
MXU op with activations bouncing through HBM; this kernel runs the whole
chain for a batch tile entirely in VMEM:

  x = gelu(x_a @ W1y + b1 + h_proj)          # condition proj precomputed
  x = gelu(x @ Wm[i] + bm[i])  for each hidden layer (static unroll)
  t, s = split(x @ Wout + bout);  s = tanh(s)
  forward:  z_b = exp(s) * x_b + t,  logdet = sum(s, -1)
  inverse:  y_b = (z_b - t) * exp(-s)

Weights for one coupling (~5.5 MB f32 at width 526) fit VMEM alongside the
batch tile. Only the Linear layer family / one-way couplings are supported —
the dominant published configuration; the model falls back to the XLA path
otherwise (`CondRealNVP(use_pallas=...)`).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _coupling_kernel(
    x_a_ref, x_b_ref, h_proj_ref, w1_ref, b1_ref, *rest_refs,
    n_hidden: int, d_b: int, inverse: bool,
):
    """One batch tile of the fused coupling chain. rest_refs layout:
    [wm_0, bm_0, ..., wm_{n_hidden-1}, bm_{n_hidden-1}, wout, bout,
     out_ref, (logdet_ref)]."""
    wm_refs = rest_refs[: 2 * n_hidden]
    wout_ref = rest_refs[2 * n_hidden]
    bout_ref = rest_refs[2 * n_hidden + 1]
    out_ref = rest_refs[2 * n_hidden + 2]
    logdet_ref = rest_refs[2 * n_hidden + 3] if not inverse else None

    x = (
        jnp.dot(x_a_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:]
        + h_proj_ref[:]
    )
    x = jax.nn.gelu(x)
    for i in range(n_hidden):
        w = wm_refs[2 * i][:]
        b = wm_refs[2 * i + 1][:]
        x = jax.nn.gelu(jnp.dot(x, w, preferred_element_type=jnp.float32) + b)
    out = jnp.dot(x, wout_ref[:], preferred_element_type=jnp.float32) + bout_ref[:]

    t = out[:, :d_b]
    s = jnp.tanh(out[:, d_b:])
    if inverse:
        out_ref[:] = (x_b_ref[:] - t) * jnp.exp(-s)
    else:
        out_ref[:] = jnp.exp(s) * x_b_ref[:] + t
        logdet_ref[:] = jnp.sum(s, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("inverse", "block_b", "interpret"))
def fused_affine_coupling(
    x_a: jnp.ndarray,
    x_b: jnp.ndarray,
    h_proj: jnp.ndarray,
    w1y: jnp.ndarray,
    b1: jnp.ndarray,
    wm: Sequence[jnp.ndarray],
    bm: Sequence[jnp.ndarray],
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    inverse: bool = False,
    block_b: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray] | jnp.ndarray:
    """Fused coupling over `(B, d_a)`/`(B, d_b)` halves.

    Returns `(z_b, logdet)` forward or `y_b` for the inverse. `wm`/`bm` are
    the hidden-layer weights (list, static length).
    """
    B, d_a = x_a.shape
    d_b = x_b.shape[1]
    H = w1y.shape[1]
    n_hidden = len(wm)

    block_b = min(block_b, B)
    grid = (pl.cdiv(B, block_b),)

    def batch_spec(cols: int) -> pl.BlockSpec:
        return pl.BlockSpec((block_b, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full_spec(shape: tuple) -> pl.BlockSpec:
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    in_specs = [
        batch_spec(d_a),            # x_a
        batch_spec(d_b),            # x_b
        batch_spec(H),              # h_proj
        full_spec((d_a, H)),        # w1y
        full_spec((1, H)),          # b1
    ]
    args = [x_a, x_b, h_proj, w1y, b1.reshape(1, -1)]
    for w, b in zip(wm, bm):
        in_specs += [full_spec((H, H)), full_spec((1, H))]
        args += [w, b.reshape(1, -1)]
    in_specs += [full_spec((H, 2 * d_b)), full_spec((1, 2 * d_b))]
    args += [wout, bout.reshape(1, -1)]

    kernel = functools.partial(
        _coupling_kernel, n_hidden=n_hidden, d_b=d_b, inverse=inverse
    )

    if inverse:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=batch_spec(d_b),
            out_shape=jax.ShapeDtypeStruct((B, d_b), x_b.dtype),
            interpret=interpret,
        )(*args)
        return out

    out, logdet = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(batch_spec(d_b), batch_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((B, d_b), x_b.dtype),
            jax.ShapeDtypeStruct((B, 1), x_b.dtype),
        ),
        interpret=interpret,
    )(*args)
    return out, logdet[:, 0]


def mlp_params_to_kernel_args(mlp_params: dict, in_dim: int) -> dict:
    """Split a NestedMLP param tree (Linear family) into kernel arguments.

    `in_dim` is the coupling half-input size; the first layer's weight rows
    beyond `in_dim` belong to the condition and are handled by the hoisted
    projection (see `NestedMLP.cond_proj`).
    """
    layers = mlp_params["layers"]
    return {
        "w1y": layers[0]["w"][:in_dim],
        "b1": layers[0]["b"],
        "wm": [p["w"] for p in layers[1:-1]],
        "bm": [p["b"] for p in layers[1:-1]],
        "wout": layers[-1]["w"],
        "bout": layers[-1]["b"],
    }
