"""Pallas TPU kernel: fused LSTM recurrence (forward + backward).

The `lax.scan` LSTM (`ops/lstm.py`) is latency/HBM-bound: every timestep
round-trips the (B, 4H) gate tensor and (B, H) state through HBM for a
matmul that takes well under a microsecond on the MXU (~33 us/step measured
for the flagship encoder). A first fused attempt with grid=(tiles, T) still
paid ~25 us of per-grid-step pipeline overhead, so this kernel keeps the
ENTIRE time loop inside the kernel body:

- grid = (batch_tiles,); each invocation owns a (T, tile_b, *) slab of the
  time-major sequence in VMEM and runs `fori_loop` over T with (h, c) as
  loop carries — zero per-step pipeline or DMA cost;
- the input projection `x @ W_ih + b` for all T steps is one big MXU matmul
  *outside* the kernel (XLA);
- backward is a second kernel looping t in the opposite order, recomputing
  the gate preactivations from the saved hidden states (one extra MXU matmul
  per step — the flash-attention-style recompute trade), accumulating dW_hh
  across the loop, and writing per-tile partials summed outside.

Replaces the reference's cuDNN-fused `nn.LSTM`
(`src/bcnf/models/feature_network.py:155`) on the TPU compute path; gate
order (i, f, g, o) matches torch so configurations transfer 1:1.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_math(gates: jnp.ndarray, c_prev: jnp.ndarray, hidden: int):
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return i, f, g, o, c, h


def _fwd_kernel(
    xp_ref, whh_ref, hs_ref, cs_ref, *, hidden: int, n_t: int, reverse: bool, prec: Any
):
    whh = whh_ref[...]
    tile_b = xp_ref.shape[1]
    zeros = jnp.zeros((tile_b, hidden), jnp.float32)

    def body(tau, carry):
        h, c = carry
        t = n_t - 1 - tau if reverse else tau
        gates = xp_ref[t] + jnp.dot(h, whh, precision=prec, preferred_element_type=jnp.float32)
        _, _, _, _, c, h = _gate_math(gates, c, hidden)
        hs_ref[t] = h
        cs_ref[t] = c
        return h, c

    jax.lax.fori_loop(0, n_t, body, (zeros, zeros))


def _bwd_kernel(
    xp_ref, whh_ref, hs_ref, cs_ref, dhs_ref,
    dxp_ref, dwhh_ref,
    *, hidden: int, n_t: int, reverse: bool, prec: Any,
):
    whh = whh_ref[...]
    tile_b = xp_ref.shape[1]
    G = 4 * hidden
    zeros = jnp.zeros((tile_b, hidden), jnp.float32)

    def body(tau, carry):
        dh_next, dc_next, dwhh = carry
        # walk the opposite order of the forward recurrence
        t = tau if reverse else n_t - 1 - tau
        first = t == (n_t - 1 if reverse else 0)  # forward's first step
        t_prev = jnp.where(first, t, t + 1 if reverse else t - 1)
        h_prev = jnp.where(first, 0.0, hs_ref[t_prev])
        c_prev = jnp.where(first, 0.0, cs_ref[t_prev])
        gates = xp_ref[t] + jnp.dot(
            h_prev, whh, precision=prec, preferred_element_type=jnp.float32
        )
        i, f, g, o, c, _h = _gate_math(gates, c_prev, hidden)
        tanh_c = jnp.tanh(c)

        dh = dhs_ref[t] + dh_next
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_next
        dgates = jnp.concatenate(
            [
                dc * g * i * (1.0 - i),
                dc * c_prev * f * (1.0 - f),
                dc * i * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dxp_ref[t] = dgates
        dh_next = jnp.dot(
            dgates, whh.T, precision=prec, preferred_element_type=jnp.float32
        )
        dc_next = dc * f
        dwhh = dwhh + jnp.dot(
            h_prev.T, dgates, precision=prec, preferred_element_type=jnp.float32
        )
        return dh_next, dc_next, dwhh

    _, _, dwhh = jax.lax.fori_loop(
        0, n_t, body, (zeros, zeros, jnp.zeros((hidden, G), jnp.float32))
    )
    dwhh_ref[0] = dwhh


@functools.lru_cache(maxsize=None)
def _make_lstm_dir(hidden: int, reverse: bool, tile_b: int, precision: str, interpret: bool):
    """Build the custom-VJP single-direction recurrence for static config."""
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def run_fwd(xp: jnp.ndarray, whh: jnp.ndarray):
        # time-major (T, B, G): each grid step owns a (T, tile_b, *) slab
        T, B, G = xp.shape
        slab = lambda d: pl.BlockSpec((T, tile_b, d), lambda bt: (0, bt, 0), memory_space=pltpu.VMEM)
        hs, cs = pl.pallas_call(
            functools.partial(_fwd_kernel, hidden=hidden, n_t=T, reverse=reverse, prec=prec),
            grid=(B // tile_b,),
            in_specs=[
                slab(G),
                pl.BlockSpec((hidden, G), lambda bt: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(slab(hidden), slab(hidden)),
            out_shape=(
                jax.ShapeDtypeStruct((T, B, hidden), jnp.float32),
                jax.ShapeDtypeStruct((T, B, hidden), jnp.float32),
            ),
            compiler_params=cparams,
            interpret=interpret,
        )(xp, whh)
        return hs, cs

    def run_bwd(xp, whh, hs, cs, dhs):
        T, B, G = xp.shape
        n_tiles = B // tile_b
        slab = lambda d: pl.BlockSpec((T, tile_b, d), lambda bt: (0, bt, 0), memory_space=pltpu.VMEM)
        dxp, dwhh_parts = pl.pallas_call(
            functools.partial(_bwd_kernel, hidden=hidden, n_t=T, reverse=reverse, prec=prec),
            grid=(n_tiles,),
            in_specs=[
                slab(G),
                pl.BlockSpec((hidden, G), lambda bt: (0, 0), memory_space=pltpu.VMEM),
                slab(hidden),
                slab(hidden),
                slab(hidden),
            ],
            out_specs=(
                slab(G),
                pl.BlockSpec((1, hidden, G), lambda bt: (bt, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, B, G), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, hidden, G), jnp.float32),
            ),
            compiler_params=cparams,
            interpret=interpret,
        )(xp, whh, hs, cs, dhs)
        return dxp, jnp.sum(dwhh_parts, axis=0)

    @jax.custom_vjp
    def lstm_dir(xp, whh):
        hs, _ = run_fwd(xp, whh)
        return hs

    def fwd(xp, whh):
        hs, cs = run_fwd(xp, whh)
        return hs, (xp, whh, hs, cs)

    def bwd(res, dhs):
        xp, whh, hs, cs = res
        dxp, dwhh = run_bwd(xp, whh, hs, cs, dhs)
        return dxp, dwhh

    lstm_dir.defvjp(fwd, bwd)
    return lstm_dir


def fused_direction(
    params: dict,
    x: jnp.ndarray,
    hidden_size: int,
    reverse: bool,
    *,
    tile_b: int = 256,
    precision: str = "default",
    interpret: bool = False,
) -> jnp.ndarray | None:
    """Fused-kernel equivalent of `ops/lstm._direction_scan`: `(B, T, F)` ->
    `(B, T, H)`. Returns None when the batch doesn't tile (caller falls back
    to the scan path)."""
    B = x.shape[0]
    tile_b = min(tile_b, B)
    if B % tile_b:
        return None
    # hoisted input projection: one big MXU matmul (XLA), laid out time-major
    xp = x @ params["w_ih"] + params["b_ih"] + params["b_hh"]
    xp = jnp.swapaxes(xp, 0, 1)  # (T, B, 4H)
    fn = _make_lstm_dir(hidden_size, reverse, tile_b, precision, interpret)
    return jnp.swapaxes(fn(xp, params["w_hh"]), 0, 1)
