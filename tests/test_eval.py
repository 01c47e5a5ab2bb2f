"""Calibration math, CV fold logic, plots, and impact extraction (host-only)."""

import numpy as np
import pytest

from bcnf_tpu.eval.calibration import (
    CDF,
    brownian_confidence_interval,
    compute_CDF_residuals,
    rank_histogram,
)
from bcnf_tpu.eval.crossvalidate import kfold_indices
from bcnf_tpu.simulation.resimulation import impact_points


def test_cdf_of_uniform_ranks_is_diagonal():
    rng = np.random.default_rng(0)
    M = 1000
    ranks = rng.integers(0, M + 1, size=(5000, 3))
    t = np.linspace(0, 1, 50)
    cdf = CDF(ranks, t, M)
    assert cdf.shape == (3, 50)
    np.testing.assert_allclose(cdf, np.broadcast_to(t, (3, 50)), atol=0.03)


def test_cdf_residuals_within_bands_for_calibrated():
    rng = np.random.default_rng(1)
    M = 500
    ranks = rng.integers(0, M + 1, size=(2000, 4))
    t, resid, ci = compute_CDF_residuals(ranks, M)
    # calibrated ranks: scaled residuals should mostly sit within ~3 bands
    inside = np.abs(resid[:, 1:-1]) <= 4 * np.maximum(ci[1:-1], 1e-3)
    assert inside.mean() > 0.98


def test_brownian_band_shape():
    t = np.linspace(0, 1, 11)
    band = brownian_confidence_interval(t)
    assert band[0] == 0 and band[-1] == 0
    assert band.max() == band[5]


def test_kolmogorov_quantile_and_joint_band():
    """The per-dim 99% sup-band must reproduce the reference notebook's
    1.628 (reference `notebooks/calibration.ipynb` cells 21-24); the
    Sidak-corrected joint band must widen monotonically with the number of
    dimensions tested and equal the per-dim band at k=1."""
    from bcnf_tpu.eval.calibration import kolmogorov_quantile, sidak_joint_band

    assert kolmogorov_quantile(0.99) == pytest.approx(1.628, abs=1e-3)
    # classic KS values as cross-checks
    assert kolmogorov_quantile(0.95) == pytest.approx(1.358, abs=1e-3)
    assert sidak_joint_band(1) == pytest.approx(1.628, abs=1e-3)
    bands = [sidak_joint_band(k) for k in (1, 4, 13, 16)]
    assert all(b2 > b1 for b1, b2 in zip(bands, bands[1:]))
    assert sidak_joint_band(16) == pytest.approx(2.008, abs=2e-3)


def test_rank_histogram_counts():
    ranks = np.tile(np.arange(0, 320, 10)[:, None], (1, 2))
    hist = rank_histogram(ranks, M_samples=320, n_bins=32)
    assert hist.shape == (2, 32)
    assert hist.sum(axis=1).tolist() == [32, 32]


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    ours = list(kfold_indices(23, 5))
    theirs = list(KFold(n_splits=5).split(np.zeros(23)))
    for (tr_a, va_a), (tr_b, va_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(va_a, va_b)


def test_impact_points_interpolation():
    # straight-line descent crossing z=0 between steps 2 and 3
    traj = np.array([[[0, 0, 2.0], [1, 0, 1.0], [2, 0, 0.5], [3, 0, -0.5]]])
    poi = impact_points(traj)
    np.testing.assert_allclose(poi[0], [2.5, 0, 0], atol=1e-6)
    # never-landing trajectory -> NaN
    up = np.array([[[0, 0, 1.0], [0, 0, 2.0]]])
    assert np.isnan(impact_points(up)).all()


def test_impact_points_nonfinite_trajectory_is_nan():
    # a diverged resimulation (inf positions around the crossing) must yield
    # NaN, never +/-inf leaking into downstream RMSE aggregation
    bad = np.array([[[0, 0, 1.0], [np.inf, np.inf, -np.inf], [0, 0, -1.0]]])
    poi = impact_points(bad)
    assert not np.isinf(poi).any()
    assert np.isnan(poi).all()
    # NaN-poisoned trajectory likewise
    nan_traj = np.array([[[0, 0, 1.0], [np.nan, 0, -1.0], [0, 0, -2.0]]])
    assert not np.isinf(impact_points(nan_traj)).any()


def test_data_plots_create():
    import pandas as pd

    from bcnf_tpu.plots import DataCovariancePlot, DataDistributionPlot, data_to_df

    data = {
        "m": list(np.random.default_rng(0).random(50)),
        "b": list(np.random.default_rng(1).random(50)),
        "cam_angles": [np.array([1.0, 2.0])] * 50,
        "trajectories": [np.zeros((5, 3))] * 50,
    }
    df = data_to_df(data)
    assert set(df.columns) == {"m", "b", "cam_angles_0", "cam_angles_1"}

    cov = DataCovariancePlot(df)
    cov.create_plots(bins=10)
    assert len(cov.figs) >= 2
    dist = DataDistributionPlot(df)
    dist.create_plots(bins=10)
    assert len(dist.figs) == 1


def test_eval_plot_functions():
    from bcnf_tpu.plots import plot_cdf_residuals, plot_impact_heatmap, plot_rank_histograms

    rng = np.random.default_rng(0)
    ranks = rng.integers(0, 101, size=(200, 4))
    fig = plot_rank_histograms(ranks, 100)
    assert fig is not None
    t, resid, ci = compute_CDF_residuals(ranks, 100)
    assert plot_cdf_residuals(t, resid) is not None
    poi = rng.normal(size=(2, 50, 3))
    assert plot_impact_heatmap(poi, index=0) is not None


def test_compute_y_hat_ranks_exact_posterior_is_uniform():
    """End-to-end rank machinery check with a known-correct posterior:
    when `model.sample` draws from the TRUE posterior, ranks are uniform
    and the scaled CDF residuals stay within the Brownian band. Isolates
    the rank/CDF code from model quality (round-2 calibration diagnosis)."""
    import jax
    import jax.numpy as jnp

    from bcnf_tpu.eval.calibration import compute_y_hat_ranks

    rng = np.random.default_rng(3)
    N, D = 400, 3
    # conjugate-Gaussian toy problem: theta ~ N(0, 1), x | theta ~ N(theta, s)
    # => theta | x ~ N(x / (1 + s^2), s^2 / (1 + s^2))
    s = 0.7
    theta = rng.normal(size=(N, D)).astype(np.float32)
    x = theta + s * rng.normal(size=(N, D)).astype(np.float32)
    post_mean = x / (1 + s**2)
    post_std = np.sqrt(s**2 / (1 + s**2))

    class _TruePosterior:
        # jnp math only: compute_y_hat_ranks jits the sample call (so the
        # mesh-sharded path partitions it), which traces this stub too
        def sample(self, params, key, m, cond):
            noise = jax.random.normal(key, (m, cond.shape[0], D))
            return (cond / (1 + s**2))[None] + post_std * noise

    ranks = compute_y_hat_ranks(
        _TruePosterior(), None, jnp.asarray(theta), jnp.asarray(x),
        M_samples=2000, key=jax.random.key(0),
    )
    _, resid, _ = compute_CDF_residuals(ranks, 2000)
    # 99% sup-band for a Brownian bridge is ~1.63; allow slack for MC noise
    assert np.abs(resid).max() < 2.2, np.abs(resid).max(axis=1)
