"""CNN video-frame conditioner (reference `src/bcnf/models/cnn.py:7-117`).

Encodes `(B, n_cams, T, H, W)` grayscale videos into per-frame features
`(B, T, output_size_lin)` that feed a downstream sequence network
(e.g. `configs/runs/dev/videos_CNN_LSTM_large.yaml`). TPU-native design:

- all cameras and frames are folded into one giant conv batch (the reference
  does the same reshape, `cnn.py:78-113`) so the convolutions are single large
  XLA conv ops on the MXU,
- padding is computed with the reference's formula
  (``((s-1)*size - s + k) // 2``, `cnn.py:33-35,45-47`) including its
  index quirk (padding uses `strides[i]`/`kernel_sizes[i]` while the conv uses
  `kernel_sizes[i+1]`/`strides[i+1]`) so feature shapes match exactly,
- the final linear fuses the per-camera features; its `*2` input factor is the
  reference's hard-coded two-camera assumption (`cnn.py:69`), kept for config
  parity.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from bcnf_tpu.models.feature_network import FeatureNetwork
from bcnf_tpu.ops.nn import Params, dropout, linear_apply, linear_init


def _conv_init(key: jax.Array, c_in: int, c_out: int, k: int) -> Params:
    fan_in = c_in * k * k
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (c_out, c_in, k, k), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def _conv_im2col(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding: tuple[int, int]) -> jnp.ndarray:
    """Low-channel conv as patches + one MXU matmul.

    The TPU conv emitter takes *minutes* to compile the weight gradient of
    low-channel convolutions — 482 s for this model's 1-channel 8x8 first
    layer (NCHW and NHWC alike) vs 2 s for this mathematically identical
    formulation (results/video_compile_probe3.json). checkpoint keeps the
    (N, c_in*k*k, H', W') patches tensor transient: it is recomputed in the
    backward instead of living between forward and backward.
    """
    c_out, c_in, k, _ = w.shape

    @jax.checkpoint
    def inner(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        patches = jax.lax.conv_general_dilated_patches(
            x, (k, k), (stride, stride),
            [(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )  # (N, c_in*k*k, H', W')
        return jnp.einsum("ncxy,oc->noxy", patches, w.reshape(c_out, c_in * k * k))

    return inner(x, w)


def _conv_apply(p: Params, x: jnp.ndarray, stride: int, padding: tuple[int, int],
                *, train: bool) -> jnp.ndarray:
    w = p["w"]
    c_out, c_in, k, _ = w.shape
    # im2col exists for the *training* path only: the TPU conv emitter's
    # weight-gradient compile is pathological for low-channel convs (482 s,
    # see _conv_im2col docstring), but its patches tensor costs k*k times the
    # input activation memory — at inference batch sizes (eval/sampling
    # encodes thousands of frames per call) that is multiple GB of HBM for
    # zero benefit, since no weight gradient is ever formed. Inference uses
    # the plain fused XLA conv.
    if train and c_in * k * k <= 128:
        out = _conv_im2col(x, w, stride, padding)
    else:
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    return out + p["b"][None, :, None, None]


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


class CNN(FeatureNetwork):
    def __init__(
        self,
        hidden_channels: Sequence[int],
        kernel_sizes: Sequence[int],
        strides: Sequence[int],
        output_size_lin: int,
        output_size: int,
        image_input_size: tuple[int, int] = (90, 160),
        dropout_prob: float = 0.5,
        num_CNN: int = 1,
        verbose: bool = False,
    ) -> None:
        self.input_size = tuple(image_input_size)
        self.output_size = output_size  # reference keeps the ctor arg (`cnn.py:22`)
        self.output_size_lin = output_size_lin
        self.hidden_channels = list(hidden_channels)
        self.kernel_sizes = list(kernel_sizes)
        self.strides = list(strides)
        self.dropout_prob = dropout_prob
        self.num_CNN = num_CNN

        # Pre-compute the layer plan (channels, kernel, stride, padding) and
        # the feature-map shapes, mirroring the reference's example-input
        # shape probing (`cnn.py:41,69-76`).
        h, w = image_input_size
        self.plan: list[tuple[int, int, int, int, tuple[int, int]]] = []
        c_in = 1
        s0, k0 = self.strides[0], self.kernel_sizes[0]
        pad = (((s0 - 1) * h - s0 + k0) // 2, ((s0 - 1) * w - s0 + k0) // 2)
        self.plan.append((c_in, self.hidden_channels[0], k0, s0, pad))
        h = ((h + 2 * pad[0] - k0) // s0 + 1) // 2  # conv then maxpool2
        w = ((w + 2 * pad[1] - k0) // s0 + 1) // 2
        c_in = self.hidden_channels[0]
        for i in range(len(self.hidden_channels) - 1):
            # reference quirk: padding uses strides[i]/kernel_sizes[i], conv
            # uses kernel_sizes[i+1]/strides[i+1] (`cnn.py:45-49`)
            sp, kp = self.strides[i], self.kernel_sizes[i]
            pad = (((sp - 1) * h - sp + kp) // 2, ((sp - 1) * w - sp + kp) // 2)
            s, k = self.strides[i + 1], self.kernel_sizes[i + 1]
            self.plan.append((c_in, self.hidden_channels[i + 1], k, s, pad))
            h = ((h + 2 * pad[0] - k) // s + 1) // 2
            w = ((w + 2 * pad[1] - k) // s + 1) // 2
            c_in = self.hidden_channels[i + 1]
        self.final_output_size = c_in * h * w
        if verbose:
            print(f"CNN plan: {self.plan}, final feature size {self.final_output_size}")

    def init(self, key: jax.Array) -> Params:
        towers = []
        for t in range(self.num_CNN):
            tkey = jax.random.fold_in(key, t)
            keys = jax.random.split(tkey, len(self.plan))
            towers.append(
                [_conv_init(k, ci, co, ks) for k, (ci, co, ks, _, _) in zip(keys, self.plan)]
            )
        # hard-coded two-camera fusion factor, reference `cnn.py:69`
        head = linear_init(jax.random.fold_in(key, 999), self.final_output_size * 2, self.output_size_lin)
        return {"towers": towers, "head": head}

    def _tower(self, tower: list[Params], x: jnp.ndarray, rng: jax.Array | None, train: bool) -> jnp.ndarray:
        for i, (p, (_, _, _, stride, pad)) in enumerate(zip(tower, self.plan)):
            x = _conv_apply(p, x, stride, pad, train=train)
            x = jax.nn.relu(x)
            if self.dropout_prob > 0:
                sub = jax.random.fold_in(rng, i) if rng is not None else None
                x = dropout(sub, x, self.dropout_prob, train)
            x = _maxpool2(x)
        return x.reshape(x.shape[0], -1)

    def apply(self, params: Params, x: jnp.ndarray, rng: jax.Array | None = None, train: bool = False) -> jnp.ndarray:
        """`(B, n_cams, T, H, W)` -> `(B, T, output_size_lin)` (reference `cnn.py:78-113`)."""
        B, n_cams, T, H, W = x.shape
        x = jnp.transpose(x, (1, 0, 2, 3, 4))  # (cams, B, T, H, W)
        if self.num_CNN > 1:
            feats = []
            for c in range(self.num_CNN):
                frames = x[c].reshape(B * T, 1, H, W)
                sub = jax.random.fold_in(rng, c) if rng is not None else None
                feats.append(self._tower(params["towers"][c], frames, sub, train))
            y = jnp.stack(feats, axis=0)  # (cams, B*T, F)
        else:
            frames = x.reshape(n_cams * B * T, 1, H, W)
            y = self._tower(params["towers"][0], frames, rng, train)  # (cams*B*T, F)
            y = y.reshape(n_cams, B * T, -1)
        y = y.reshape(n_cams, B, T, -1).transpose(1, 0, 2, 3)  # (B, cams, T, F)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, -1)  # concat cameras per frame
        return linear_apply(params["head"], y)
