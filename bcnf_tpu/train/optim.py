"""Optimizers and LR scheduling.

Replaces the reference's `OptimizerFactory` / `SchedulerFactory`
(`src/bcnf/factories.py:13-30`, Adam + `torch.optim.lr_scheduler.ReduceLROnPlateau`)
with optax. The learning rate is injected as a mutable hyperparameter so the
host-side plateau scheduler can lower it between epochs without recompiling
the jitted train step.

SURVEY.md Q3 fix: gradient clipping happens *before* the optimizer update
(the reference's `Trainer._train_batch` clips after `optimizer.step()`,
`src/bcnf/train/trainer.py:271-275`, which is a no-op; its legacy trainer
clips before, `src/bcnf/train/train.py:135-138` — we follow the legacy/correct
order).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax


def make_optimizer(
    optimizer: str = "Adam",
    lr: float = 1e-3,
    max_grad_norm: float | None = 1.0,
    **kwargs: Any,
) -> optax.GradientTransformation:
    """Build the (clip -> update) chain with an injectable learning rate."""
    name = optimizer.lower()

    def factory(learning_rate: float) -> optax.GradientTransformation:
        if name == "adam":
            opt = optax.adam(learning_rate, **kwargs)
        elif name == "adamw":
            opt = optax.adamw(learning_rate, **kwargs)
        elif name == "sgd":
            opt = optax.sgd(learning_rate, **kwargs)
        else:
            raise NotImplementedError(f"Optimizer {optimizer} not implemented")
        if max_grad_norm is not None:
            return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
        return opt

    return optax.inject_hyperparams(factory)(learning_rate=lr)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Mutate the injected learning rate in an `inject_hyperparams` state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def get_learning_rate(opt_state: Any) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class ReduceLROnPlateau:
    """Host-side plateau LR scheduler with torch-compatible semantics
    (`torch.optim.lr_scheduler.ReduceLROnPlateau`, used by every reference run
    config, e.g. `configs/runs/old/trajectory_LSTM_large.yaml:57-64`)."""

    def __init__(
        self,
        mode: str = "min",
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        cooldown: int = 0,
        min_lr: float = 0.0,
        eps: float = 1e-8,
    ) -> None:
        if factor >= 1.0:
            raise ValueError("Factor should be < 1.0.")
        if mode not in ("min", "max"):
            raise ValueError(f"mode {mode} is unknown")
        if threshold_mode not in ("rel", "abs"):
            raise ValueError(f"threshold mode {threshold_mode} is unknown")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.eps = eps
        self.best = float("inf") if mode == "min" else -float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, current: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return current < self.best * (1.0 - self.threshold)
            return current < self.best - self.threshold
        if self.threshold_mode == "rel":
            return current > self.best * (1.0 + self.threshold)
        return current > self.best + self.threshold

    def step(self, metric: float, lr: float) -> float:
        """Record a metric; returns the (possibly reduced) learning rate."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            new_lr = max(lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
            if lr - new_lr > self.eps:
                return new_lr
        return lr

    def state_dict(self) -> dict:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, state: dict) -> None:
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]
        self.cooldown_counter = state["cooldown_counter"]
