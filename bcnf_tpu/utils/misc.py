"""Small numeric utilities shared across the framework."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inn_nll_loss(z: jnp.ndarray, log_det_J: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Change-of-variables NLL used for training and reported in the README table.

    Parity: reference `src/bcnf/utils.py:49-53`. NOTE (SURVEY.md Q9): the
    constant ``D/2*log(2*pi)`` is deliberately omitted, matching the reference's
    convention so NLL numbers are directly comparable.
    """
    per_example = 0.5 * jnp.sum(z**2, axis=1) - log_det_J
    if reduction == "mean":
        return jnp.mean(per_example)
    return per_example


def get_gaussian_kernel(sigma: float, window_size: int | None = None) -> np.ndarray:
    """Unnormalized Gaussian kernel (reference `src/bcnf/utils.py:56-60`)."""
    if window_size is None:
        window_size = int(sigma * 3.5)
    return np.exp(-np.arange(-window_size, window_size + 1) ** 2 / (2 * sigma**2))


def partconv1d(data: np.ndarray, kernel: np.ndarray, periodic: bool = False) -> np.ndarray:
    """Edge-normalized 1-D convolution (reference `src/bcnf/utils.py:63-111`).

    Convolves ``data`` with ``kernel``, renormalizing the truncated kernel at
    the edges so boundary values are unbiased; optional periodic padding.
    """
    if not isinstance(data, np.ndarray) or not isinstance(kernel, np.ndarray):
        raise ValueError("Data and kernel must be numpy arrays.")
    if len(kernel) % 2 == 0:
        raise ValueError("Kernel size must be odd.")

    window_size = len(kernel) // 2

    if periodic:
        data = np.concatenate((data[-window_size:], data, data[:window_size]))

    middle = np.convolve(data, kernel / kernel.sum(), mode="valid")

    left = np.empty(2 * window_size - 1)
    right = np.empty(2 * window_size - 1)
    for i in range(1, 2 * window_size):
        left[i - 1] = data[:i] @ kernel[-i:] / kernel[-i:].sum()
        right[i - 1] = (
            data[-2 * window_size + i:] @ kernel[: 2 * window_size - i] / kernel[: 2 * window_size - i].sum()
        )

    out = np.concatenate((left[window_size - 1:], middle, right[:window_size]))

    if periodic:
        out = out[window_size:-window_size]

    return out


def get_data_type(dtype: str) -> jnp.dtype:
    """Map config dtype strings to jnp dtypes (reference `src/bcnf/train/utils.py:12-34`)."""
    if dtype == "float64":
        return jnp.float64
    if dtype == "bfloat16":
        return jnp.bfloat16
    if dtype != "float32":
        print("dtype was not correctly specified in the config file, using default value 'float32'")
    return jnp.float32
