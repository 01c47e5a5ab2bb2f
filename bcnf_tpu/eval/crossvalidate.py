"""K-fold cross-validation for HPO objectives.

Parity: reference `src/bcnf/eval/crossvalidate.py:12-94` (sklearn KFold, fresh
model/optimizer per fold, divergence handling to skip bad HPO points). Folds
are split with NumPy directly — no sklearn dependency needed in the hot path.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np

from bcnf_tpu.errors import TrainingDivergedError
from bcnf_tpu.train.trainer import train_CondRealNVP


def kfold_indices(n: int, n_splits: int, shuffle: bool = False, random_state: int | None = None):
    """Yield (train_idx, val_idx) pairs, matching sklearn.KFold semantics."""
    indices = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(random_state)
        rng.shuffle(indices)
    fold_sizes = np.full(n_splits, n // n_splits, dtype=int)
    fold_sizes[: n % n_splits] += 1
    current = 0
    for size in fold_sizes:
        val = indices[current: current + size]
        train = np.concatenate([indices[:current], indices[current + size:]])
        yield train, val
        current += size


def cross_validate(
    model_factory: Callable[[], Any],
    y: np.ndarray,
    conditions: Sequence[np.ndarray],
    n_splits: int = 5,
    n_epochs: int = 1,
    batch_size: int = 64,
    lr: float = 1e-3,
    val_loss_patience: int | None = None,
    val_loss_tolerance: float = 1e-3,
    val_loss_tolerance_mode: str = "rel",
    timeout: float | None = None,
    verbose: bool = False,
    shuffle: bool = False,
    random_state: int | None = None,
    errors: str = "raise",
) -> list[dict[str, Any]]:
    """Train a fresh model per fold; returns per-fold loss summaries
    (reference `cross_validate`, `src/bcnf/eval/crossvalidate.py:12-94`)."""
    fold_metrics: list[dict[str, Any]] = []
    for i, (train_index, val_index) in enumerate(kfold_indices(len(y), n_splits, shuffle, random_state)):
        model = model_factory()
        params = model.init(jax.random.key(i))
        try:
            params, history = train_CondRealNVP(
                model,
                params,
                y[train_index],
                [c[train_index] for c in conditions],
                y[val_index],
                [c[val_index] for c in conditions],
                n_epochs=n_epochs,
                batch_size=batch_size,
                lr=lr,
                val_loss_patience=val_loss_patience,
                val_loss_tolerance=val_loss_tolerance,
                val_loss_tolerance_mode=val_loss_tolerance_mode,
                timeout=timeout,
                verbose=verbose,
                seed=i,
            )
        except TrainingDivergedError as e:
            print(f"Error in fold {i}: {e}")
            if errors == "raise":
                raise
            continue

        fold_metrics.append(
            {
                "loss_history": history,
                "train_loss": history["train"][-1] if history["train"] else float("nan"),
                "val_loss": history["val"][-1] if history["val"] else float("nan"),
            }
        )
    return fold_metrics
