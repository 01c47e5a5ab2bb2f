"""Checkpointable Bayesian (GP) hyperparameter optimization.

Functional replacement for the reference's patched-skopt loop
(`src/bcnf/gp_minimize/gp_minimize.py:21-194`: `gp_minimize_fixed` /
`base_minimize_fixed` with a per-iteration `save_checkpoint` and resume via
re-seeded x0/y0). skopt is not available in the target image, so the
optimizer is built directly on sklearn's GaussianProcessRegressor (Matern-5/2
+ white noise) with an expected-improvement acquisition maximized by random
multi-start — the same algorithm skopt's gp_minimize uses.

The search-space surface mirrors skopt: `Real` (uniform / log-uniform),
`Integer`, `Categorical`.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Search-space dimensions
# ---------------------------------------------------------------------------


@dataclass
class Real:
    low: float
    high: float
    prior: str = "uniform"  # or "log-uniform"
    name: str | None = None

    def to_unit(self, x: float) -> float:
        if self.prior == "log-uniform":
            return (np.log(x) - np.log(self.low)) / (np.log(self.high) - np.log(self.low))
        return (x - self.low) / (self.high - self.low)

    def from_unit(self, u: float) -> float:
        u = float(np.clip(u, 0.0, 1.0))
        if self.prior == "log-uniform":
            return float(np.exp(np.log(self.low) + u * (np.log(self.high) - np.log(self.low))))
        return float(self.low + u * (self.high - self.low))

    def sample(self, rng: np.random.Generator) -> float:
        return self.from_unit(rng.uniform())


@dataclass
class Integer:
    low: int
    high: int
    name: str | None = None

    def to_unit(self, x: int) -> float:
        return (x - self.low) / max(self.high - self.low, 1)

    def from_unit(self, u: float) -> int:
        return int(round(self.low + float(np.clip(u, 0, 1)) * (self.high - self.low)))

    def sample(self, rng: np.random.Generator) -> int:
        return int(rng.integers(self.low, self.high + 1))


@dataclass
class Categorical:
    categories: Sequence[Any]
    name: str | None = None

    def to_unit(self, x: Any) -> float:
        return list(self.categories).index(x) / max(len(self.categories) - 1, 1)

    def from_unit(self, u: float) -> Any:
        idx = int(round(float(np.clip(u, 0, 1)) * (len(self.categories) - 1)))
        return list(self.categories)[idx]

    def sample(self, rng: np.random.Generator) -> Any:
        return list(self.categories)[rng.integers(len(self.categories))]


Dimension = Real | Integer | Categorical


@dataclass
class OptimizeResult:
    """Result container (skopt-compatible attribute surface)."""

    x: list
    fun: float
    x_iters: list[list] = field(default_factory=list)
    func_vals: list[float] = field(default_factory=list)


# ---------------------------------------------------------------------------
# The optimizer
# ---------------------------------------------------------------------------


def _to_unit(dimensions: Sequence[Dimension], x: Sequence[Any]) -> np.ndarray:
    return np.array([d.to_unit(v) for d, v in zip(dimensions, x)], dtype=float)


def _from_unit(dimensions: Sequence[Dimension], u: np.ndarray) -> list:
    return [d.from_unit(v) for d, v in zip(dimensions, u)]


def _expected_improvement(mu: np.ndarray, sigma: np.ndarray, best: float, xi: float = 0.01) -> np.ndarray:
    from scipy.stats import norm

    sigma = np.maximum(sigma, 1e-12)
    imp = best - mu - xi
    z = imp / sigma
    return imp * norm.cdf(z) + sigma * norm.pdf(z)


def _fit_gp(X: np.ndarray, y: np.ndarray, random_state: int):
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import ConstantKernel, Matern, WhiteKernel

    kernel = ConstantKernel(1.0) * Matern(length_scale=np.full(X.shape[1], 0.3), nu=2.5) + WhiteKernel(1e-6)
    gp = GaussianProcessRegressor(
        kernel=kernel, normalize_y=True, n_restarts_optimizer=2, random_state=random_state
    )
    gp.fit(X, y)
    return gp


def save_checkpoint(checkpoint_file: str, state: dict) -> None:
    """Atomic checkpoint of the optimizer state (reference
    `gp_minimize/gp_minimize.py:173-194` pickles minus unpicklables)."""
    os.makedirs(os.path.dirname(os.path.abspath(checkpoint_file)), exist_ok=True)
    tmp = checkpoint_file + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, checkpoint_file)


def load_checkpoint(checkpoint_file: str) -> dict | None:
    if not os.path.exists(checkpoint_file):
        return None
    with open(checkpoint_file, "rb") as f:
        return pickle.load(f)


def gp_minimize_fixed(
    func: Callable[[list], float],
    dimensions: Sequence[Dimension],
    n_calls: int = 50,
    n_initial_points: int = 10,
    checkpoint_file: str | None = None,
    random_state: int = 0,
    x0: list[list] | None = None,
    y0: list[float] | None = None,
    n_candidates: int = 5000,
    verbose: bool = False,
) -> OptimizeResult:
    """Minimize `func` over the search space; checkpoint every iteration and
    resume automatically from `checkpoint_file` (reference
    `gp_minimize_fixed` / `base_minimize_fixed`,
    `src/bcnf/gp_minimize/gp_minimize.py:21-171`)."""
    rng = np.random.default_rng(random_state)
    x_iters: list[list] = list(x0 or [])
    func_vals: list[float] = list(y0 or [])

    state = load_checkpoint(checkpoint_file) if checkpoint_file else None
    if state is not None:
        x_iters = state["x_iters"]
        func_vals = state["func_vals"]
        rng = np.random.default_rng(state.get("rng_seed", random_state))
        if verbose:
            print(f"Resumed HPO from {checkpoint_file} with {len(x_iters)} evaluations")

    while len(func_vals) < n_calls:
        i = len(func_vals)
        if i < n_initial_points or len(x_iters) < 2:
            x_next = [d.sample(rng) for d in dimensions]
        else:
            X = np.stack([_to_unit(dimensions, x) for x in x_iters])
            y = np.asarray(func_vals, dtype=float)
            finite = np.isfinite(y)
            penalty = y[finite].max() if finite.any() else 0.0
            y = np.where(finite, y, penalty)
            gp = _fit_gp(X, y, random_state)
            cand = rng.uniform(size=(n_candidates, len(dimensions)))
            mu, sigma = gp.predict(cand, return_std=True)
            ei = _expected_improvement(mu, sigma, y.min())
            x_next = _from_unit(dimensions, cand[int(np.argmax(ei))])

        val = float(func(x_next))
        x_iters.append(list(x_next))
        func_vals.append(val)
        if verbose:
            print(f"[HPO {i + 1}/{n_calls}] f({x_next}) = {val:.4f} (best {min(func_vals):.4f})")

        if checkpoint_file:
            save_checkpoint(
                checkpoint_file,
                {"x_iters": x_iters, "func_vals": func_vals, "rng_seed": int(rng.integers(2**31))},
            )
            rng = np.random.default_rng(
                load_checkpoint(checkpoint_file)["rng_seed"]
            )

    vals = np.asarray(func_vals, dtype=float)
    vals = np.where(np.isfinite(vals), vals, np.inf)  # diverged points never win
    best = int(np.argmin(vals))
    return OptimizeResult(
        x=x_iters[best], fun=float(vals[best]), x_iters=x_iters, func_vals=func_vals
    )
