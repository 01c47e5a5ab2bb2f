"""Conditional RealNVP normalizing flow — TPU-native functional core.

Redesign of reference `src/bcnf/models/cnf.py:49-588` for JAX/XLA:

- **Pure functions, pytree params.** The reference's `nn.Module` stack mutates
  `self.log_det_J` (`cnf.py:487-488`); here every transform is
  ``forward(params, y, h) -> (z, log_det)`` / ``inverse(params, z, h) -> y``
  with no hidden state, so the whole model jits, vmaps, and shards cleanly.

- **`lax.scan` over blocks.** The stack is `(n_blocks-1) x [ActNorm?,
  AffineCoupling, Orthonormal] + final AffineCoupling` (reference
  `cnf.py:394-423`). All block parameters are stacked with a leading block
  axis and the stack is executed as a single `lax.scan`, giving O(1) HLO size
  regardless of depth (fast compiles, XLA-schedulable pipeline).

- **Hoisted condition projections.** Each coupling MLP concatenates the
  condition vector (size ~1360) to its half-input (size ~10)
  (reference `cnf.py:100-101`), so >99% of the first-layer FLOPs are the
  condition part — identical math every block. We split the first-layer weight
  ``W1 = [W1_y; W1_h]`` and precompute ``h @ W1_h`` for *all* blocks in one
  batched MXU matmul outside the scan; the sequential part keeps only the tiny
  ``y_half @ W1_y`` plus the hidden layers. The same hoisting makes posterior
  sampling cheap: conditions are encoded and projected **once** per batch, not
  once per draw (fixes the reference inefficiency at `cnf.py:497`).

Behavioral deltas vs the reference are documented inline (SURVEY.md Q4/Q7).
"""

from __future__ import annotations

import contextlib
import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from bcnf_tpu.ops.nn import (
    Params,
    dropout,
    get_activation,
    get_dense_layer,
    linear_init,
)
from bcnf_tpu.models.splines import n_spline_params, rational_quadratic_spline


def count_params(params: Any) -> int:
    """Total number of scalar parameters in a pytree (reference `cnf.py:19-20`)."""
    return sum(int(x.size) for x in jax.tree.leaves(params))


# --- SPMD-local tracing context -------------------------------------------
#
# XLA cannot shard-propagate through a Pallas custom call, so the fused-kernel
# gates normally require a single device. Inside `jax.shard_map`, however, the
# trace sees only the per-device shard — the kernel is valid there and runs
# once per chip with no cross-device traffic. The Trainer wraps its DP train
# step in shard_map and traces the loss under `spmd_local()` to tell the gates
# the multi-device check does not apply.
_SPMD_LOCAL = False


@contextlib.contextmanager
def spmd_local():
    """Mark the enclosed trace as per-shard code inside `shard_map` (the
    fused-kernel gates then skip the single-device requirement)."""
    global _SPMD_LOCAL
    prev = _SPMD_LOCAL
    _SPMD_LOCAL = True
    try:
        yield
    finally:
        _SPMD_LOCAL = prev


def _pallas_interpret() -> bool:
    """Test hook: BCNF_PALLAS_INTERPRET=1 runs the fused kernels in Pallas
    interpret mode so the full model fast path is testable on CPU."""
    return os.environ.get("BCNF_PALLAS_INTERPRET", "") == "1"


def _fused_platform_ok() -> bool:
    """Mosaic kernels lower on TPU only (or anywhere in interpret mode), and
    only when the trace is single-device — one real chip, or the per-shard
    body of a shard_map (`spmd_local`)."""
    backend_ok = jax.default_backend() == "tpu" or _pallas_interpret()
    device_ok = _SPMD_LOCAL or jax.device_count() == 1
    return backend_ok and device_ok


# ---------------------------------------------------------------------------
# Conditional nested MLP (reference `ConditionalNestedNeuralNetwork`,
# `src/bcnf/models/cnf.py:49-107`)
# ---------------------------------------------------------------------------


class NestedMLP:
    """The conditioner MLP inside a coupling layer.

    ``sizes = [half_in] + nested_sizes + [half_out]``; the first layer input is
    widened by ``n_conditions`` and the last layer output by
    ``n_output_parameters`` (reference `cnf.py:69-85`).
    """

    def __init__(
        self,
        sizes: Sequence[int],
        n_conditions: int,
        n_output_parameters: int,
        layer: str = "Linear",
        layer_kwargs: dict | None = None,
        activation: str = "GELU",
        activation_kwargs: dict | None = None,
        dropout: float = 0.0,
    ) -> None:
        if len(sizes) < 2:
            raise ValueError("NestedMLP requires at least input and output sizes")
        self.in_dim = sizes[0]
        self.n_conditions = n_conditions
        self.dims = [sizes[0] + n_conditions] + list(sizes[1:-1]) + [sizes[-1] * n_output_parameters]
        self.family = get_dense_layer(layer, layer_kwargs)
        self.activation_name = activation
        self.act = get_activation(activation, **(activation_kwargs or {}))
        self.dropout_rate = dropout
        # The first-layer split trick requires a plain linear-style first layer.
        self.splittable = n_conditions > 0 and self.family.name in ("Linear", "AnyGLU")

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, len(self.dims) - 1)
        return {
            "layers": [
                self.family.init(k, self.dims[i], self.dims[i + 1])
                for i, k in enumerate(keys)
            ]
        }

    def _first_weights(self, layer0: Params) -> list[Params]:
        if self.family.name == "Linear":
            return [layer0]
        return [layer0["value"], layer0["gate"]]  # AnyGLU

    def cond_proj(self, params: Params, h: jnp.ndarray) -> list[jnp.ndarray] | None:
        """Precompute ``h @ W1_h`` (stack-aware: works on per-block-stacked params).

        Returns a list (one entry per first-layer matrix; 2 for AnyGLU) of
        arrays shaped ``(..., B, hidden)`` with the params' leading block axes
        preserved, or None when the trick does not apply.
        """
        if not self.splittable:
            return None
        return [
            jnp.einsum("bc,...ch->...bh", h, p["w"][..., self.in_dim:, :])
            for p in self._first_weights(params["layers"][0])
        ]

    def apply(
        self,
        params: Params,
        y: jnp.ndarray,
        h: jnp.ndarray | None,
        h_proj: jnp.ndarray | None = None,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        layers = params["layers"]
        if self.splittable and h_proj is not None:
            firsts = self._first_weights(layers[0])
            outs = [
                y @ p["w"][: self.in_dim] + p["b"] + h_proj[i]
                for i, p in enumerate(firsts)
            ]
            if self.family.name == "Linear":
                x = outs[0]
            else:  # AnyGLU: value * act(gate)
                x = outs[0] * self.family.glu_act(outs[1])
        else:
            inp = jnp.concatenate([y, h], axis=-1) if self.n_conditions > 0 and h is not None else y
            x = self.family.apply(layers[0], inp)

        n_hidden = len(layers) - 1
        for i in range(n_hidden):
            if i > 0:
                x = self.family.apply(layers[i], x)
            x = self.act(x)
            if self.dropout_rate > 0 and train:
                sub = jax.random.fold_in(rng, i) if rng is not None else None
                x = dropout(sub, x, self.dropout_rate, train)
        return self.family.apply(layers[-1], x)


# ---------------------------------------------------------------------------
# Coupling layers
# ---------------------------------------------------------------------------


class AffineCoupling:
    """Conditional affine coupling (reference `ConditionalAffineCouplingLayer`,
    `src/bcnf/models/cnf.py:110-213`), incl. the optional `two_way` second
    half-transform (`cnf.py:143-153,182-184`). Scale is `tanh`-bounded
    (`cnf.py:107`) for stability, exactly as the reference."""

    def __init__(
        self,
        input_size: int,
        nested_sizes: Sequence[int],
        n_conditions: int,
        layer: str = "Linear",
        layer_kwargs: dict | None = None,
        activation: str = "GELU",
        activation_kwargs: dict | None = None,
        dropout: float = 0.0,
        two_way: bool = False,
    ) -> None:
        self.input_size = input_size
        self.d_a = math.ceil(input_size / 2)
        self.d_b = math.floor(input_size / 2)
        self.two_way = two_way
        kw = dict(
            n_conditions=n_conditions,
            n_output_parameters=2,
            layer=layer,
            layer_kwargs=layer_kwargs,
            activation=activation,
            activation_kwargs=activation_kwargs,
            dropout=dropout,
        )
        self.nn_a = NestedMLP([self.d_a] + list(nested_sizes) + [self.d_b], **kw)
        self.nn_b = NestedMLP([self.d_b] + list(nested_sizes) + [self.d_a], **kw) if two_way else None

    def init(self, key: jax.Array) -> Params:
        ka, kb = jax.random.split(key)
        p = {"a": self.nn_a.init(ka)}
        if self.nn_b is not None:
            p["b"] = self.nn_b.init(kb)
        return p

    def _coeffs(self, mlp: NestedMLP, p: Params, y: jnp.ndarray, h: jnp.ndarray | None,
                h_proj: jnp.ndarray | None, rng: jax.Array | None, train: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
        out = mlp.apply(p, y, h, h_proj, rng, train)
        t, s = jnp.split(out, 2, axis=-1)
        return t, jnp.tanh(s)

    def cond_proj(self, params: Params, h: jnp.ndarray) -> dict:
        projs = {"a": self.nn_a.cond_proj(params["a"], h)}
        if self.nn_b is not None:
            projs["b"] = self.nn_b.cond_proj(params["b"], h)
        return projs

    def forward(
        self,
        params: Params,
        y: jnp.ndarray,
        h: jnp.ndarray | None = None,
        h_proj: dict | None = None,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        h_proj = h_proj or {}
        ra = rb = None
        if rng is not None:
            ra, rb = jax.random.split(rng)
        y_a, y_b = y[..., : self.d_a], y[..., self.d_a:]
        t_a, log_s_a = self._coeffs(self.nn_a, params["a"], y_a, h, h_proj.get("a"), ra, train)
        z_b = jnp.exp(log_s_a) * y_b + t_a
        log_det = jnp.sum(log_s_a, axis=-1)
        if self.nn_b is not None:
            # the second half-transform conditions on the *transformed* z_b
            # (reference `cnf.py:183`)
            t_b, log_s_b = self._coeffs(self.nn_b, params["b"], z_b, h, h_proj.get("b"), rb, train)
            z_a = jnp.exp(log_s_b) * y_a + t_b
            log_det = log_det + jnp.sum(log_s_b, axis=-1)
        else:
            z_a = y_a
        return jnp.concatenate([z_a, z_b], axis=-1), log_det

    def inverse(
        self,
        params: Params,
        z: jnp.ndarray,
        h: jnp.ndarray | None = None,
        h_proj: dict | None = None,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        # NOTE (deliberate divergence): the reference's two_way inverse is NOT
        # the inverse of its forward — it evaluates `nn_a(z_a)` where the
        # forward used `nn_a(y_a)` and `nn_b(y_b)` where the forward used
        # `nn_b(z_b)` (reference `cnf.py:198-213` vs `:165-196`), so round
        # trips fail whenever two_way=True. We implement the correct order:
        # undo the b-conditioned transform of y_a first (its conditioner input
        # z_b is directly available), then undo the a-side.
        h_proj = h_proj or {}
        ra = rb = None
        if rng is not None:
            ra, rb = jax.random.split(rng)
        z_a, z_b = z[..., : self.d_a], z[..., self.d_a:]
        if self.nn_b is not None:
            t_b, log_s_b = self._coeffs(self.nn_b, params["b"], z_b, h, h_proj.get("b"), rb, train)
            y_a = (z_a - t_b) * jnp.exp(-log_s_b)
        else:
            y_a = z_a
        t_a, log_s_a = self._coeffs(self.nn_a, params["a"], y_a, h, h_proj.get("a"), ra, train)
        y_b = (z_b - t_a) * jnp.exp(-log_s_a)
        return jnp.concatenate([y_a, y_b], axis=-1)

    @property
    def fusable(self) -> bool:
        """Whether the Pallas fused kernel covers this coupling: one-way,
        Linear conditioner family, and GELU activation — the kernels
        (ops/flow_kernel.py, ops/coupling_kernel.py) hardcode GELU, so any
        other activation must take the XLA path."""
        return (
            self.nn_b is None
            and self.nn_a.family.name == "Linear"
            and self.nn_a.activation_name == "GELU"
        )

    def forward_fused(self, params: Params, y: jnp.ndarray, h_proj: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Pallas fast path (eval only: no dropout); see ops/coupling_kernel.py."""
        from bcnf_tpu.ops.coupling_kernel import fused_affine_coupling, mlp_params_to_kernel_args

        args = mlp_params_to_kernel_args(params["a"], self.d_a)
        z_b, ld = fused_affine_coupling(
            y[..., : self.d_a], y[..., self.d_a:], h_proj["a"][0], **args
        )
        return jnp.concatenate([y[..., : self.d_a], z_b], axis=-1), ld

    def inverse_fused(self, params: Params, z: jnp.ndarray, h_proj: dict) -> jnp.ndarray:
        from bcnf_tpu.ops.coupling_kernel import fused_affine_coupling, mlp_params_to_kernel_args

        args = mlp_params_to_kernel_args(params["a"], self.d_a)
        y_b = fused_affine_coupling(
            z[..., : self.d_a], z[..., self.d_a:], h_proj["a"][0], inverse=True, **args
        )
        return jnp.concatenate([z[..., : self.d_a], y_b], axis=-1)


class RQSCoupling:
    """Rational-quadratic-spline coupling — the *working* realization of the
    reference's intended `ConditionalRQSplineCouplingLayer` (SURVEY.md Q4:
    the reference's class performs affine transforms and its spline module is
    dead code; reference `src/bcnf/models/cnf.py:216-309`)."""

    def __init__(
        self,
        input_size: int,
        nested_sizes: Sequence[int],
        n_conditions: int,
        num_bins: int = 8,
        tail_bound: float = 3.0,
        dropout: float = 0.0,
        layer: str = "Linear",
        layer_kwargs: dict | None = None,
        activation: str = "GELU",
        activation_kwargs: dict | None = None,
        two_way: bool = False,
    ) -> None:
        self.input_size = input_size
        self.d_a = math.ceil(input_size / 2)
        self.d_b = math.floor(input_size / 2)
        self.num_bins = num_bins
        self.tail_bound = tail_bound
        self.two_way = two_way
        kw = dict(
            n_conditions=n_conditions,
            n_output_parameters=n_spline_params(num_bins),
            layer=layer,
            layer_kwargs=layer_kwargs,
            activation=activation,
            activation_kwargs=activation_kwargs,
            dropout=dropout,
        )
        self.nn_a = NestedMLP([self.d_a] + list(nested_sizes) + [self.d_b], **kw)
        self.nn_b = NestedMLP([self.d_b] + list(nested_sizes) + [self.d_a], **kw) if two_way else None

    def init(self, key: jax.Array) -> Params:
        ka, kb = jax.random.split(key)
        p = {"a": self.nn_a.init(ka)}
        if self.nn_b is not None:
            p["b"] = self.nn_b.init(kb)
        return p

    def cond_proj(self, params: Params, h: jnp.ndarray) -> dict:
        projs = {"a": self.nn_a.cond_proj(params["a"], h)}
        if self.nn_b is not None:
            projs["b"] = self.nn_b.cond_proj(params["b"], h)
        return projs

    def _spline(self, mlp: NestedMLP, p: Params, y_in: jnp.ndarray, y_trans: jnp.ndarray,
                h: jnp.ndarray | None, h_proj: jnp.ndarray | None,
                rng: jax.Array | None, train: bool, inverse: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
        d_out = y_trans.shape[-1]
        raw = mlp.apply(p, y_in, h, h_proj, rng, train)
        raw = raw.reshape(raw.shape[:-1] + (d_out, n_spline_params(self.num_bins)))
        K = self.num_bins
        out, ld = rational_quadratic_spline(
            y_trans,
            raw[..., :K],
            raw[..., K: 2 * K],
            raw[..., 2 * K:],
            inverse=inverse,
            tail_bound=self.tail_bound,
        )
        return out, jnp.sum(ld, axis=-1)

    def forward(self, params: Params, y: jnp.ndarray, h: jnp.ndarray | None = None,
                h_proj: dict | None = None, rng: jax.Array | None = None,
                train: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        h_proj = h_proj or {}
        ra = rb = None
        if rng is not None:
            ra, rb = jax.random.split(rng)
        y_a, y_b = y[..., : self.d_a], y[..., self.d_a:]
        z_b, ld = self._spline(self.nn_a, params["a"], y_a, y_b, h, h_proj.get("a"), ra, train, False)
        if self.nn_b is not None:
            z_a, ld_b = self._spline(self.nn_b, params["b"], z_b, y_a, h, h_proj.get("b"), rb, train, False)
            ld = ld + ld_b
        else:
            z_a = y_a
        return jnp.concatenate([z_a, z_b], axis=-1), ld

    def inverse(self, params: Params, z: jnp.ndarray, h: jnp.ndarray | None = None,
                h_proj: dict | None = None, rng: jax.Array | None = None,
                train: bool = False) -> jnp.ndarray:
        # Correct two_way inversion order (see AffineCoupling.inverse note):
        # nn_b conditions on z_b (available), recovering y_a; then nn_a
        # conditions on y_a, recovering y_b.
        h_proj = h_proj or {}
        ra = rb = None
        if rng is not None:
            ra, rb = jax.random.split(rng)
        z_a, z_b = z[..., : self.d_a], z[..., self.d_a:]
        if self.nn_b is not None:
            y_a, _ = self._spline(self.nn_b, params["b"], z_b, z_a, h, h_proj.get("b"), rb, train, True)
        else:
            y_a = z_a
        y_b, _ = self._spline(self.nn_a, params["a"], y_a, z_b, h, h_proj.get("a"), ra, train, True)
        return jnp.concatenate([y_a, y_b], axis=-1)


# ---------------------------------------------------------------------------
# ActNorm & fixed orthonormal mixing
# ---------------------------------------------------------------------------


class ActNorm:
    """Learnable elementwise affine (reference `src/bcnf/models/cnf.py:342-354`).

    SURVEY.md Q7: like the reference, initialization is scale=1 / bias=0 with
    *no* data-dependent init (Glow-style init can be layered on via the trainer
    if desired); log-det is ``sum(log|scale|)``.
    """

    def __init__(self, size: int) -> None:
        self.size = size

    def init(self, key: jax.Array) -> Params:
        del key
        return {"scale": jnp.ones(self.size), "bias": jnp.zeros(self.size)}

    def forward(self, params: Params, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        z = params["scale"] * x + params["bias"]
        ld = jnp.sum(jnp.log(jnp.abs(params["scale"])), axis=-1)
        return z, jnp.broadcast_to(ld, x.shape[:-1])

    def inverse(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        return (z - params["bias"]) / params["scale"]


def orthonormal_init(seed: Any, size: int) -> jnp.ndarray:
    """Fixed random orthonormal matrix via QR (reference `cnf.py:322-324`);
    non-trainable, log-det 0.

    The QR runs entirely on host in float64 (NumPy/LAPACK): on-device f32 QR
    in this stack is only ~1e-3 orthogonal, which breaks flow invertibility;
    a float64 Q cast to f32 is orthonormal to ~1e-7. `seed` is any
    `np.random.default_rng`-compatible seed (int or sequence).
    """
    import numpy as _np

    rng = _np.random.default_rng(seed)
    q, _ = _np.linalg.qr(rng.standard_normal((size, size)))
    return jnp.asarray(q, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# The full conditional flow
# ---------------------------------------------------------------------------


class CondRealNVP:
    """Conditional RealNVP v2 (reference `CondRealNVP_v2`, `src/bcnf/models/cnf.py:357-588`).

    Static configuration object; parameters live in the pytree returned by
    :meth:`init`. Structure (reference `cnf.py:394-423`)::

        (n_blocks - 1) x [ActNorm?, Coupling, Orthonormal]  +  final Coupling

    NOTE (deliberate divergence): the reference seeds every
    `OrthonormalTransformation` with the *same* `random_state`
    (`cnf.py:319-323`), making all mixing matrices identical. We derive one
    subkey per block (better mixing); no weight-level compatibility is lost
    since checkpoints don't transfer across frameworks.
    """

    def __init__(
        self,
        size: int,
        nested_sizes: Sequence[int],
        n_blocks: int,
        n_conditions: int,
        feature_network_stack: Any | None = None,
        dropout: float = 0.0,
        act_norm: bool = False,
        two_way: bool = False,
        layer: str = "Linear",
        layer_kwargs: dict | None = None,
        activation: str = "GELU",
        activation_kwargs: dict | None = None,
        random_state: int | None = None,
        parameter_index_mapping: Any = None,
        hybrid: bool = False,
        coupling: str = "affine",
        coupling_kwargs: dict | None = None,
        precision: str = "highest",
        use_pallas: bool = True,
        pallas_strict: bool = False,
    ) -> None:
        self.size = size
        self.nested_sizes = list(nested_sizes)
        self.n_blocks = n_blocks
        self.n_conditions = n_conditions
        self.features = feature_network_stack if n_conditions > 0 else None
        self.dropout = dropout
        self.act_norm = act_norm
        self.two_way = two_way
        self.random_state = random_state
        self.parameter_index_mapping = parameter_index_mapping
        self.hybrid = hybrid
        # Matmul precision for the whole model. TPU MXU matmuls default to
        # bf16 inputs (~1e-2 relative error), which visibly breaks flow
        # invertibility (inverse(forward(y)) != y at 1e-2) — "highest" forces
        # f32 accumulation. Set "default" to trade fidelity for MXU speed.
        self.precision = precision
        # Pallas fused whole-flow kernel for posterior sampling: ON by
        # default since round 2 — at equal accuracy class it beats the XLA
        # path at every precision tier (round-4 results/flow_kernel_bench.json:
        # f32 contract 514k vs 360k samples/s; the kernel's bf16x3 mode is
        # f32-class at 3.8e-6 roundtrip while XLA's X3 algorithm is ~1e-3)
        # and falls back to XLA for any unsupported config/layout/precision.
        self.use_pallas = use_pallas
        self.pallas_strict = pallas_strict
        # The per-coupling fused kernel (ops/coupling_kernel.py) loses to XLA
        # for published shapes (PARITY.md round 1) — opt-in only; the
        # whole-flow kernel above is the production fast path.
        self.use_pallas_coupling = False
        # lax.scan unroll factor for the block stack; >1 lets XLA pipeline
        # weight loads against compute across consecutive blocks (tunable;
        # see scripts/train_profile.py)
        self.scan_unroll = 1
        # Block-boundary rematerialization: checkpoint the scan body so the
        # backward pass recomputes each block's MLP intermediates from the
        # tiny (B, size) block inputs instead of reading ~5 saved (B, H)
        # activations per block back from HBM. Trades ~1.33x matmul FLOPs
        # for a large cut in HBM residual traffic (the training step's
        # bottleneck at large batch). Tunable via `training.remat` /
        # scripts/train_profile.py.
        self.remat = False

        common = dict(
            input_size=size,
            nested_sizes=nested_sizes,
            n_conditions=n_conditions,
            layer=layer,
            layer_kwargs=layer_kwargs,
            activation=activation,
            activation_kwargs=activation_kwargs,
            dropout=dropout,
            two_way=two_way,
        )
        if coupling == "affine":
            self.coupling = AffineCoupling(**common)
        elif coupling == "rqs":
            self.coupling = RQSCoupling(**common, **(coupling_kwargs or {}))
        else:
            raise NotImplementedError(f"Coupling type {coupling} not implemented")
        self.actnorm = ActNorm(size) if act_norm else None

    # -- construction -----------------------------------------------------

    def init(self, key: jax.Array | None = None) -> Params:
        if key is None:
            key = jax.random.key(self.random_state if self.random_state is not None else 0)
        k_feat, k_blocks, k_final, k_ortho, k_head = jax.random.split(key, 5)

        params: Params = {}
        if self.features is not None:
            params["features"] = self.features.init(k_feat)

        n_inner = self.n_blocks - 1
        if n_inner > 0:
            block_keys = jax.random.split(k_blocks, n_inner)
            coupling_stacked = jax.vmap(self.coupling.init)(block_keys)
            # host-side float64 QR, seeded from random_state + block index
            base_seed = self.random_state if self.random_state is not None else 0
            ortho_stacked = jnp.stack(
                [orthonormal_init([base_seed, i], self.size) for i in range(n_inner)]
            )
            blocks: Params = {"coupling": coupling_stacked, "ortho": ortho_stacked}
            if self.actnorm is not None:
                blocks["actnorm"] = jax.vmap(self.actnorm.init)(block_keys)
            params["blocks"] = blocks
        params["final"] = self.coupling.init(k_final)
        if self.hybrid:
            params["head"] = linear_init(k_head, self.n_conditions, self.size)
        return params

    def n_params(self, params: Params) -> int:
        return count_params(params)

    def init_actnorm(
        self, params: Params, y: jnp.ndarray, *conditions: jnp.ndarray, eps: float = 1e-6
    ) -> Params:
        """Glow-style data-dependent ActNorm initialization (fixes SURVEY.md
        Q7: the reference initializes scale=1/bias=0, `src/bcnf/models/cnf.py:342-354`,
        which lets scales drift to f32 overflow under long training).

        Walks the stack once with a data batch, setting each ActNorm's scale
        to 1/std and bias to -mean/std of its *own input*, so every block sees
        a zero-mean unit-variance activation at step 0. Returns updated params.
        """
        if self.actnorm is None:
            return params
        blocks = params.get("blocks")
        if blocks is None or "actnorm" not in blocks:
            return params

        # One jitted program (not an eager walk): over the axon tunnel each
        # eager primitive is a separate device round-trip, which turns this
        # one-time init into minutes of dispatch latency for deep stacks.
        from bcnf_tpu.utils.jit import tpu_safe_jit

        n_inner = self.n_blocks - 1

        @tpu_safe_jit
        def _compute(params: Params, y: jnp.ndarray, conditions: tuple) -> tuple:
            blocks = params["blocks"]
            h = self.encode(params, conditions) if self.features is not None else None
            scale = blocks["actnorm"]["scale"]
            bias = blocks["actnorm"]["bias"]
            x = y
            with jax.default_matmul_precision(self.precision):
                for i in range(n_inner):
                    mu = jnp.mean(x, axis=0)
                    sd = jnp.std(x, axis=0) + eps
                    s_i, b_i = 1.0 / sd, -mu / sd
                    scale = scale.at[i].set(s_i)
                    bias = bias.at[i].set(b_i)
                    x = x * s_i + b_i
                    cp_i = jax.tree.map(lambda p: p[i], blocks["coupling"])
                    x, _ = self.coupling.forward(cp_i, x, h)
                    x = x @ blocks["ortho"][i]
            return scale, bias

        scale, bias = _compute(params, y, tuple(conditions))
        new_blocks = dict(blocks)
        new_blocks["actnorm"] = {"scale": scale, "bias": bias}
        new_params = dict(params)
        new_params["blocks"] = new_blocks
        return new_params

    def verify(self) -> None:
        """Shape-chain check over the feature networks (reference `cnf.py:425-440`)."""
        if self.features is None:
            return
        def _norm(s: Any) -> Any:
            return tuple(s) if isinstance(s, (list, tuple)) else s

        current = None
        for fn in self.features.feature_networks:
            in_size = _norm(getattr(fn, "input_size", None))
            out_size = _norm(getattr(fn, "output_size", None))
            if in_size is None and out_size is None:
                continue
            if current is not None and in_size not in (None, current):
                raise AssertionError(
                    f"Feature network output {current} does not match next input {in_size}."
                )
            if out_size is not None:
                current = out_size
        if current is not None and current != self.n_conditions:
            raise AssertionError(
                f"Feature network output {current} must match n_conditions {self.n_conditions}."
            )

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "CondRealNVP":
        """Build from a reference-schema run config (reference `cnf.py:442-456`)."""
        from bcnf_tpu.config import ParameterIndexMapping
        from bcnf_tpu.factories import FeatureNetworkFactory
        from bcnf_tpu.models.feature_network import FeatureNetworkStack

        feature_networks = [
            FeatureNetworkFactory.get_feature_network(fn_config["type"], dict(fn_config.get("kwargs") or {}))
            for fn_config in config["feature_networks"]
        ]
        model_kwargs = {k: v for k, v in dict(config["model"]["kwargs"]).items() if k != "device"}
        if "nested_sizes" in model_kwargs:
            model_kwargs["nested_sizes"] = list(model_kwargs["nested_sizes"])
        model = cls(
            feature_network_stack=FeatureNetworkStack(feature_networks),
            parameter_index_mapping=ParameterIndexMapping(
                list(config["global"]["parameter_selection"])
            ),
            **model_kwargs,
        )
        model.verify()
        return model

    # -- encoding ---------------------------------------------------------

    def encode(
        self,
        params: Params,
        conditions: Sequence[jnp.ndarray],
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Run the feature-network stack once (reference `cnf.py:467-473`)."""
        if self.features is None:
            raise ValueError("Model has no conditions")
        with jax.default_matmul_precision(self.precision):
            return self.features.apply(params["features"], *conditions, rng=rng, train=train)

    # -- scan machinery ---------------------------------------------------

    def _rngs(self, rng: jax.Array | None) -> tuple:
        if rng is None:
            rng = jax.random.key(0)
        return jax.random.split(rng, 4)

    def _use_fused(self, train: bool) -> bool:
        """Pallas fast path applies at eval time (no dropout inside the
        kernel) for one-way Linear GELU affine couplings with conditions.
        Structural guards: `stack_flow_params` needs at least one inner block
        (`params["blocks"]`) and at least two nested hidden layers (the
        middle-weight stack `wm` would otherwise be empty)."""
        return (
            self.use_pallas
            and not train
            and self.n_conditions > 0
            and self.n_blocks > 1
            and len(self.nested_sizes) >= 2
            and getattr(self.coupling, "fusable", False)
            # TPU backend + single-device trace (one chip, or the per-shard
            # body of the Trainer's shard_map DP step — see `spmd_local`)
            and _fused_platform_ok()
        )

    def _use_fused_coupling(self, train: bool) -> bool:
        """Per-coupling kernel gate (opt-in; see use_pallas_coupling)."""
        return self.use_pallas_coupling and self._use_fused(train)

    def _block_xs(self, params: Params, h: jnp.ndarray | None) -> tuple[Params | None, dict | None]:
        """Per-block scan inputs: stacked params (+ hoisted condition
        projections, whose leaves are (n_blocks-1, B, hidden))."""
        blocks = params.get("blocks")
        if blocks is None:
            return None, None
        projs = None
        if h is not None:
            projs = self.coupling.cond_proj(blocks["coupling"], h)
        return blocks, projs

    def forward(
        self,
        params: Params,
        y: jnp.ndarray,
        *conditions: jnp.ndarray,
        rng: jax.Array | None = None,
        train: bool = False,
        return_features: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray] | tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """theta -> z with log|det J| (reference `cnf.py:467-493`)."""
        r_feat, r_blocks, r_final, _ = self._rngs(rng)
        h = self.encode(params, conditions, r_feat, train) if self.features is not None else None

        if h is not None and self._use_fused_train(train, batch=int(y.shape[0])):
            res = self.forward_fused_flow(params, y, h)
            if res is not None:
                z, log_det = res
                return (z, log_det, h) if return_features else (z, log_det)

        fused = self._use_fused_coupling(train)
        with jax.default_matmul_precision(self.precision):
            log_det = jnp.zeros(y.shape[:-1])
            blocks, projs = self._block_xs(params, h)
            if blocks is not None:
                n_inner = self.n_blocks - 1
                block_rngs = jax.random.split(r_blocks, n_inner)

                def body(carry: tuple, xs: tuple) -> tuple[tuple, None]:
                    yy, ld = carry
                    blk, proj, brng = xs
                    if self.actnorm is not None:
                        yy, ld_an = self.actnorm.forward(blk["actnorm"], yy)
                        ld = ld + ld_an
                    if fused and proj is not None:
                        yy, ld_c = self.coupling.forward_fused(blk["coupling"], yy, proj)
                    else:
                        yy, ld_c = self.coupling.forward(
                            blk["coupling"], yy, h, proj, brng if train else None, train
                        )
                    ld = ld + ld_c
                    # fixed (non-trainable) mixing matrix, reference
                    # `cnf.py:323-324`: stop_gradient keeps Adam from
                    # drifting it off the orthonormal manifold (which would
                    # silently break logdet=0 and inverse-via-transpose)
                    yy = yy @ jax.lax.stop_gradient(blk["ortho"])
                    return (yy, ld), None

                (y, log_det), _ = jax.lax.scan(
                    jax.checkpoint(body) if self.remat else body,
                    (y, log_det), (blocks, projs, block_rngs),
                    unroll=self.scan_unroll,
                )

            final_proj = self.coupling.cond_proj(params["final"], h) if h is not None else None
            if fused and final_proj is not None:
                y, ld_f = self.coupling.forward_fused(params["final"], y, final_proj)
            else:
                y, ld_f = self.coupling.forward(
                    params["final"], y, h, final_proj, r_final if train else None, train
                )
            log_det = log_det + ld_f

        if return_features:
            return y, log_det, h
        return y, log_det

    def inverse(
        self,
        params: Params,
        z: jnp.ndarray,
        *conditions: jnp.ndarray,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """z -> theta (reference `cnf.py:495-508`)."""
        r_feat, _, _, _ = self._rngs(rng)
        h = self.encode(params, conditions, r_feat, train) if self.features is not None else None
        return self.inverse_given_h(params, z, h, rng=rng, train=train)

    def inverse_given_h(
        self,
        params: Params,
        z: jnp.ndarray,
        h: jnp.ndarray | None,
        rng: jax.Array | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Inverse with a pre-encoded condition vector — lets callers encode
        conditions once and reuse across many z draws (posterior sampling)."""
        _, r_blocks, r_final, _ = self._rngs(rng)

        fused = self._use_fused_coupling(train)
        with jax.default_matmul_precision(self.precision):
            final_proj = self.coupling.cond_proj(params["final"], h) if h is not None else None
            if fused and final_proj is not None:
                z = self.coupling.inverse_fused(params["final"], z, final_proj)
            else:
                z = self.coupling.inverse(
                    params["final"], z, h, final_proj, r_final if train else None, train
                )

            blocks, projs = self._block_xs(params, h)
            if blocks is not None:
                n_inner = self.n_blocks - 1
                flip = lambda tree: jax.tree.map(lambda x: jnp.flip(x, axis=0), tree)
                blocks_r = flip(blocks)
                projs_r = flip(projs) if projs is not None else None
                block_rngs = jax.random.split(r_blocks, n_inner)[::-1]

                def body(carry: jnp.ndarray, xs: tuple) -> tuple[jnp.ndarray, None]:
                    zz = carry
                    blk, proj, brng = xs
                    zz = zz @ jax.lax.stop_gradient(blk["ortho"]).T
                    if fused and proj is not None:
                        zz = self.coupling.inverse_fused(blk["coupling"], zz, proj)
                    else:
                        zz = self.coupling.inverse(
                            blk["coupling"], zz, h, proj, brng if train else None, train
                        )
                    if self.actnorm is not None:
                        zz = self.actnorm.inverse(blk["actnorm"], zz)
                    return zz, None

                z, _ = jax.lax.scan(
                    body, z, (blocks_r, projs_r, block_rngs), unroll=self.scan_unroll
                )
        return z

    # -- probabilistic API -------------------------------------------------

    def log_prob(
        self, params: Params, y: jnp.ndarray, *conditions: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-example log p(theta | condition) under the reference's NLL
        convention (constant omitted, SURVEY.md Q9)."""
        z, log_det = self.forward(params, y, *conditions)
        return -(0.5 * jnp.sum(z**2, axis=-1) - log_det)

    def predict_head(self, params: Params, h: jnp.ndarray) -> jnp.ndarray:
        """Hybrid prediction head (reference `cnf.py:391-392`)."""
        if not self.hybrid:
            raise ValueError("Model was not built with hybrid=True")
        return h @ params["head"]["w"] + params["head"]["b"]

    def sample(
        self,
        params: Params,
        key: jax.Array,
        n_samples: int,
        *conditions: jnp.ndarray,
        sigma: float = 1.0,
        outer: bool = True,
    ) -> jnp.ndarray:
        """Draw `n_samples` posterior samples per condition row.

        Returns `(n_samples, N, size)` matching the reference's `outer=True`
        broadcast semantics (reference `cnf.py:540-588`). Conditions are
        encoded once; the inverse pass is vmapped over draws.
        """
        conditions = tuple(
            c[None] if c.ndim == 1 else c for c in conditions
        )
        h = self.encode(params, conditions) if self.features is not None else None
        N = conditions[0].shape[0] if conditions else 1
        z = sigma * jax.random.normal(key, (n_samples, N, self.size))
        if not outer:
            z = sigma * jax.random.normal(key, (n_samples, self.size))
            return self.inverse_given_h(params, z, h)
        if self._use_fused(train=False) and h is not None:
            y = self.inverse_fused_flow(params, z.reshape(n_samples * N, self.size), h)
            if y is not None:
                return y.reshape(n_samples, N, self.size)
        return jax.vmap(lambda zz: self.inverse_given_h(params, zz, h))(z)

    # matmul-precision string -> fused-kernel dot mode; anything missing here
    # (e.g. X6/F32_F32_F32 algorithm strings) falls back to the XLA path so
    # the kernel never silently degrades numerics (round-1 advisor finding).
    #
    # Mode choice is driven by measurement on the flagship model
    # (results/flow_kernel_bench.json, 1x v5e):
    # - "x3" (hand-written bf16x3 decomposition) measures 3.8e-6 max |dy| vs
    #   the f32 XLA path — indistinguishable from the exact-f32 kernel mode's
    #   3.1e-6 (both dominated by non-matmul rounding) at 1.8x its speed, so
    #   it serves the highest/float32 contract. Set `pallas_strict=True` on
    #   the model to force the exact-f32 kernel mode instead.
    # - Mosaic lowers an f32 DEFAULT-precision dot as ~3 bf16 passes
    #   (measured 2.5e-3 per-dot rel err == the BF16_BF16_F32_X3 class), so
    #   the X3 string maps to kernel "default": 4e-4 end-to-end, 2x faster
    #   than the explicit 3-dot decomposition.
    _FUSED_PRECISION_MODES = {
        "highest": "x3",
        "float32": "x3",
        "default": "default",
        "bfloat16": "default",
        "BF16_BF16_F32_X3": "default",
    }

    def _fused_flow_args(self, params: Params, h: jnp.ndarray) -> tuple[dict, jnp.ndarray]:
        """Stacked kernel args + (K+1, N, H) condition projections for the
        whole-flow Pallas kernel (ops/flow_kernel.py), with the hidden width
        zero-padded to a 128-lane multiple so MXU tiles are fully used."""
        from bcnf_tpu.ops.flow_kernel import pad_hidden, stack_flow_params

        kargs = stack_flow_params(self, params)
        proj_blocks = self.coupling.cond_proj(params["blocks"]["coupling"], h)["a"][0]
        proj_final = self.coupling.cond_proj(params["final"], h)["a"][0]
        h_proj = jnp.concatenate([proj_blocks, proj_final[None]], axis=0)
        kargs, h_proj = pad_hidden(kargs, h_proj)
        return kargs, h_proj

    # Minimum batch size for the fused whole-flow *training* kernel.
    # Measured on 1x v5e. Round 2 (results/flow_kernel_bench.json) put the
    # crossover at ~2048: the fused step lost to XLA at batch 256 (14.7k vs
    # 14.9k samples/s) with a ~234 s Mosaic backward compile. Round 5's two
    # independent sweeps (results/batch_sweep.json) show the fused path now
    # winning at EVERY batch on the current toolchain — b256 20.6/20.7k vs
    # XLA 19.1/19.2k (+8%), b4096 36.6/36.8k vs 32.1/32.2k (+14%), b8192
    # 38.2/38.3k where XLA reproducibly fails to compile — with fused
    # compiles at 15-21 s. The measured gate therefore opens at 256.
    # Override per-model via the `fused_train_min_batch` attribute or
    # globally via the BCNF_FUSED_TRAIN_MIN_BATCH env var.
    fused_train_min_batch: int = 256

    def _use_fused_train(self, train: bool, batch: int | None = None) -> bool:
        """Fused training-step gate: same structural requirements as
        `_use_fused` plus a dropout-free coupling MLP when `train=True`
        (the training kernel has no in-kernel PRNG), plus a measured
        batch-size floor (see `fused_train_min_batch`)."""
        min_batch = int(os.environ.get(
            "BCNF_FUSED_TRAIN_MIN_BATCH", self.fused_train_min_batch
        ))
        return (
            self.use_pallas
            and self.n_conditions > 0
            and self.n_blocks > 1
            and len(self.nested_sizes) >= 2
            and getattr(self.coupling, "fusable", False)
            and (not train or float(self.dropout) == 0.0)
            and (batch is None or batch >= min_batch)
            and _fused_platform_ok()  # see _use_fused
        )

    def forward_fused_flow(
        self, params: Params, y: jnp.ndarray, h: jnp.ndarray, block_b: int = 512
    ) -> tuple[jnp.ndarray, jnp.ndarray] | None:
        """Whole-flow fused *differentiable* forward (ops/flow_kernel.py
        `fused_flow_train`): one Pallas kernel for z+logdet, a second for the
        hand-written backward that recomputes per-block MLP activations from
        the stored (B, size) block boundaries (VMEM-resident remat). Returns
        None when the shape/precision family is unsupported."""
        from bcnf_tpu.ops.flow_kernel import fused_flow_train

        mode = self._FUSED_PRECISION_MODES.get(self.precision)
        if mode is None:
            return None
        if getattr(self, "pallas_strict", False) and self.precision in ("highest", "float32"):
            mode = "highest"
        with jax.default_matmul_precision("highest" if mode == "x3" else self.precision):
            kargs, h_proj = self._fused_flow_args(params, h)
            return fused_flow_train(
                y, h_proj, kargs, block_b=block_b, precision=mode,
                interpret=_pallas_interpret(),
            )

    def inverse_fused_flow(
        self, params: Params, z_flat: jnp.ndarray, h: jnp.ndarray, block_b: int = 512
    ) -> jnp.ndarray | None:
        """Whole-flow fused inverse over draws-major flattened rows
        (row = draw * N + cond). Returns None when the batch/condition
        layout or the requested matmul precision isn't supported by the
        kernel (callers then take the XLA path)."""
        from bcnf_tpu.ops.flow_kernel import fused_flow

        mode = self._FUSED_PRECISION_MODES.get(self.precision)
        if mode is None:
            return None
        if getattr(self, "pallas_strict", False) and self.precision in ("highest", "float32"):
            mode = "highest"
        N = h.shape[0]
        B = z_flat.shape[0]
        bb = min(block_b, B)
        if not (N % bb == 0 or bb % N == 0):
            return None
        # Pad the row count up to a tile multiple with wrap-around rows
        # (draws-major layout keeps real rows' condition mapping intact; the
        # pad rows are computed on duplicated z and sliced off).
        Bp = ((B + bb - 1) // bb) * bb
        if Bp != B:
            z_flat = jnp.concatenate([z_flat, z_flat[: Bp - B]], axis=0)
        # h_proj einsum + padding run inside the context too: at x3/highest
        # the projections must not silently drop to bf16.
        with jax.default_matmul_precision("highest" if mode == "x3" else self.precision):
            kargs, h_proj = self._fused_flow_args(params, h)
            out = fused_flow(
                z_flat, h_proj, **kargs,
                inverse=True, n_cond=N, block_b=bb,
                precision=mode, interpret=_pallas_interpret(),
            )
        return out[:B] if Bp != B else out


# Backwards-compatible alias matching the reference class name
CondRealNVP_v2 = CondRealNVP
