"""Monotonic rational-quadratic splines (Durkan et al. 2019, neural spline flows).

The reference ships spline math adapted from bayesiains/nsf
(`src/bcnf/models/splines.py:1-167`) but never invokes it — its
`ConditionalRQSplineCouplingLayer` actually performs affine transforms
(SURVEY.md Q4, reference `src/bcnf/models/cnf.py:216-309`). Here we provide a
*working* RQS transform usable as an optional coupling
(`model.kwargs.coupling: rqs`), implemented branch-free for XLA: the bin
search is a vectorized comparison-sum (no `searchsorted` gather chains), and
the inverse solves the quadratic in closed form
(reference `src/bcnf/models/splines.py:139-155` pattern).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def n_spline_params(num_bins: int) -> int:
    """Parameters per transformed dimension: K widths + K heights + (K-1) interior derivatives."""
    return 3 * num_bins - 1


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 3.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unconstrained RQS with linear tails outside ``[-tail_bound, tail_bound]``.

    Shapes: ``inputs (...,)``; ``unnormalized_widths/heights (..., K)``;
    ``unnormalized_derivatives (..., K-1)`` (boundary derivatives pinned so the
    tails are identity, reference `src/bcnf/models/splines.py:36-45`).
    Returns ``(outputs, log_abs_det)`` elementwise.
    """
    num_bins = unnormalized_widths.shape[-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    # clamp so the spline math is well-defined everywhere; outputs for the
    # outside region are overwritten with the identity at the end.
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    # Pad boundary derivatives with the value whose softplus is exactly 1
    # (identity slope at the tails).
    constant = math.log(math.expm1(1.0 - min_derivative))
    pad = jnp.full(unnormalized_derivatives.shape[:-1] + (1,), constant,
                   dtype=unnormalized_derivatives.dtype)
    unnormalized_derivatives = jnp.concatenate([pad, unnormalized_derivatives, pad], axis=-1)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.concatenate([jnp.zeros_like(cumwidths[..., :1]), cumwidths], axis=-1)
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.concatenate([jnp.zeros_like(cumheights[..., :1]), cumheights], axis=-1)
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # Branch-free bin search: index = (number of knots <= x) - 1, clipped.
    knots = cumheights if inverse else cumwidths
    idx = jnp.sum(knots[..., :-1] <= x[..., None], axis=-1) - 1
    idx = jnp.clip(idx, 0, num_bins - 1)

    take = lambda arr: jnp.take_along_axis(arr, idx[..., None], axis=-1)[..., 0]
    in_cumwidths = take(cumwidths[..., :-1])
    in_widths = take(widths)
    in_cumheights = take(cumheights[..., :-1])
    in_heights = take(heights)
    in_delta = take(heights / widths)
    in_d = take(derivatives[..., :-1])
    in_d_plus = take(derivatives[..., 1:])

    if inverse:
        y_rel = x - in_cumheights
        term = y_rel * (in_d + in_d_plus - 2 * in_delta)
        a = in_heights * (in_delta - in_d) + term
        b = in_heights * in_d - term
        c = -in_delta * y_rel
        discriminant = b**2 - 4 * a * c
        discriminant = jnp.maximum(discriminant, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs = root * in_widths + in_cumwidths

        theta_one_minus_theta = root * (1 - root)
        denominator = in_delta + (in_d + in_d_plus - 2 * in_delta) * theta_one_minus_theta
        derivative_numerator = in_delta**2 * (
            in_d_plus * root**2 + 2 * in_delta * theta_one_minus_theta + in_d * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(derivative_numerator) - 2 * jnp.log(denominator))
    else:
        theta = (x - in_cumwidths) / in_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = in_heights * (in_delta * theta**2 + in_d * theta_one_minus_theta)
        denominator = in_delta + (in_d + in_d_plus - 2 * in_delta) * theta_one_minus_theta
        outputs = in_cumheights + numerator / denominator

        derivative_numerator = in_delta**2 * (
            in_d_plus * theta**2 + 2 * in_delta * theta_one_minus_theta + in_d * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet
