"""The training runtime: jitted train/eval steps inside a host epoch loop.

TPU-native redesign of reference `src/bcnf/train/trainer.py:20-303`:

- one jit-compiled `train_step` (value_and_grad + clipped Adam update) with
  donated params/optimizer state — no per-batch host<->device traffic; metrics
  accumulate on device and are fetched once per epoch,
- data stays in HBM (`DeviceDataset`); shuffling is a device-side
  `jax.random.permutation` per epoch,
- multi-chip data parallelism: pass a `Mesh` and batches are sharded over the
  `data` axis with params replicated; XLA inserts the gradient psum over ICI,
- identical control surface: validation split, rolling-window plateau early
  stop, `ReduceLROnPlateau`, divergence detection (loss > 1e5 or NaN after
  epoch 10, reference `trainer.py:168-169`), wall-clock timeout
  (`trainer.py:236-238`), hybrid MSE-head objective with the reference's
  `(nll + w*mse)/(1+w)` combination (`trainer.py:269`),
- plus step-level checkpoint/resume, which the reference lacks entirely
  (SURVEY.md section 5.4).

Deliberate divergences (documented): gradient clip *before* the optimizer step
(Q3), shuffled validation split (Q2), divergence check on the epoch-mean loss
instead of per-batch (avoids a host sync every batch; same guard, reference
checks per batch at `trainer.py:168`).
"""

from __future__ import annotations

import time

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bcnf_tpu.config import ParameterIndexMapping
from bcnf_tpu.errors import TrainingDivergedError
from bcnf_tpu.train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from bcnf_tpu.train.data import DeviceDataset, TrainerDataHandler
from bcnf_tpu.train.history import MetricSink, StdoutSink, TrainerParameterHistoryHandler
from bcnf_tpu.train.optim import (
    ReduceLROnPlateau,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from bcnf_tpu.utils.jit import tpu_safe_jit
from bcnf_tpu.utils.misc import get_data_type, inn_nll_loss
from bcnf_tpu.parallel.mesh import batch_sharding, replicate, shard_batch

class Trainer:
    """Reference `Trainer` (`src/bcnf/train/trainer.py:20`) with a jitted core."""

    def __init__(
        self,
        config: dict,
        project_name: str = "bcnf",
        run_name: str = "run",
        parameter_index_mapping: ParameterIndexMapping | None = None,
        hybrid_weight: float = 0.0,
        verbose: bool = False,
        sink: MetricSink | None = None,
        mesh: Any = None,
        seed: int | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        data: tuple[np.ndarray, list[np.ndarray]] | None = None,
    ) -> None:
        self.config = config
        self.verbose = verbose
        self.project_name = project_name
        self.run_name = run_name
        self.parameter_index_mapping = parameter_index_mapping
        self.hybrid_weight = float(hybrid_weight or 0.0)
        self.mesh = mesh
        self.sink = sink if sink is not None else (StdoutSink() if verbose else None)
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every

        training = config["training"]
        self.seed = seed if seed is not None else int(training.get("random_state", 0) or 0)

        self.meta_scheduler = TrainerParameterHistoryHandler(
            val_loss_window_size=training["val_loss_window_size"],
            val_loss_patience=training["val_loss_patience"],
            val_loss_tolerance_mode=training["val_loss_tolerance_mode"],
            val_loss_tolerance=training["val_loss_tolerance"],
            sink=self.sink,
        )

        self.dtype = get_data_type(config["global"]["dtype"])
        self.data_handler = TrainerDataHandler()
        if data is not None:
            self.data = data
        else:
            self.data = self.data_handler.get_data_for_training(
                config=config,
                dtype=self.dtype,
                parameter_index_mapping=parameter_index_mapping,
                verbose=verbose,
                seed=self.seed,
            )
        self.loss_function = inn_nll_loss

    # ------------------------------------------------------------------

    def _build_steps(self, model: Any, optimizer: Any) -> tuple[Any, Any]:
        hybrid_weight = self.hybrid_weight
        n_cond = model.n_conditions
        freeze_features = bool(self.config["training"].get("freeze_features", False))

        def loss_fn(params: Any, y: jnp.ndarray, conditions: tuple, rng: jax.Array) -> tuple:
            if n_cond > 0:
                z, log_det, h = model.forward(
                    params, y, *conditions, rng=rng, train=True, return_features=True
                )
            else:
                z, log_det = model.forward(params, y, rng=rng, train=True)
                h = None
            nll = self.loss_function(z, log_det)
            if hybrid_weight > 0 and h is not None:
                y_hat = model.predict_head(params, h)
                mse = jnp.mean((y_hat - y) ** 2)
            else:
                mse = jnp.zeros(())
            loss = (nll + mse * hybrid_weight) / (1 + hybrid_weight)
            return loss, (nll, mse, jnp.mean(log_det))

        if self.mesh is not None:
            # DP via shard_map: the step body traces per-shard (params
            # replicated, batch sharded over the data axis) and reduces
            # grads/metrics with an explicit pmean over ICI. Unlike plain
            # jit-with-sharding this keeps the per-device trace single-chip,
            # so the fused Pallas kernels stay legal inside (`spmd_local`) —
            # XLA cannot shard-propagate through a custom call, but under
            # shard_map the kernel simply runs once per chip on its shard.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from bcnf_tpu.models.cnf import spmd_local

            axis = self.mesh.axis_names[0]

            def _local_grads(params: Any, y: jnp.ndarray, conditions: tuple, rng: jax.Array) -> tuple:
                # per-shard dropout keys must differ or all chips drop the
                # same units (dropout=0 paths are key-independent)
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
                with spmd_local():
                    (loss, (nll, mse, ld)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params, y, conditions, rng)
                metrics = jax.lax.pmean(jnp.stack([loss, nll, mse, ld]), axis)
                return jax.lax.pmean(grads, axis), metrics

            grad_fn = shard_map(
                _local_grads,
                mesh=self.mesh,
                in_specs=(P(), P(axis), P(axis), P()),
                out_specs=(P(), P()),
                check_vma=False,  # pallas_call outputs carry no vma info
            )
        else:

            def grad_fn(params: Any, y: jnp.ndarray, conditions: tuple, rng: jax.Array) -> tuple:
                (loss, (nll, mse, ld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, y, conditions, rng
                )
                return grads, jnp.stack([loss, nll, mse, ld])

        # tpu_safe_jit (not plain jit): current libtpu can abort or hang in
        # XLA's memory-bound loop optimizer on scan-heavy programs (see
        # utils/jit.py); the video CNN+LSTM+flow step is exactly that shape.
        @tpu_safe_jit(donate_argnums=(0, 1))
        def train_step(params: Any, opt_state: Any, y: jnp.ndarray, conditions: tuple, rng: jax.Array) -> tuple:
            grads, metrics = grad_fn(params, y, conditions, rng)
            if freeze_features and "features" in grads:
                # pretrained-conditioner workflow: flow-only training
                grads = dict(grads)
                grads["features"] = jax.tree.map(jnp.zeros_like, grads["features"])
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        @tpu_safe_jit
        def val_step(params: Any, y: jnp.ndarray, conditions: tuple, w: jnp.ndarray) -> tuple:
            # `w` is 1 for real rows, 0 for wrap-around pad rows: every batch
            # has the same static shape, so this compiles exactly once.
            if n_cond > 0:
                z, log_det, h = model.forward(params, y, *conditions, return_features=True)
            else:
                z, log_det = model.forward(params, y)
                h = None
            wsum = jnp.sum(w)
            per_example = self.loss_function(z, log_det, reduction="none")
            nll = jnp.sum(w * per_example) / wsum
            if hybrid_weight > 0 and h is not None:
                y_hat = model.predict_head(params, h)
                mse = jnp.sum(w[:, None] * (y_hat - y) ** 2) / (wsum * y.shape[1])
            else:
                mse = jnp.zeros(())
            loss = (nll + mse * hybrid_weight) / (1 + hybrid_weight)
            metrics = jnp.stack([loss, nll, mse, jnp.sum(w * log_det) / wsum])
            z_mean = jnp.sum(w[:, None] * z, axis=0) / wsum
            z_var = jnp.sum(w[:, None] * (z - z_mean) ** 2, axis=0) / wsum
            return metrics, wsum, z_mean, jnp.sqrt(z_var)

        return train_step, val_step

    # ------------------------------------------------------------------

    def train(self, model: Any, params: Any = None, fold: int = -1) -> Any:
        """Train `model`, returning the trained parameter pytree
        (reference `Trainer.train`, `src/bcnf/train/trainer.py:50-111`)."""
        cfg_t = self.config["training"]
        # Optional matmul-precision override for the whole training run
        # (e.g. training.precision: BF16_BF16_F32_X3 for ~1.4x step
        # throughput at ~2e-3 matmul error; see results/train_profile.json).
        if cfg_t.get("precision"):
            model.precision = str(cfg_t["precision"])
        # Optional block-boundary rematerialization (training.remat: true):
        # backward recomputes MLP intermediates instead of reading saved
        # activations from HBM — see CondRealNVP.remat.
        if cfg_t.get("remat") is not None:
            model.remat = bool(cfg_t["remat"])
        opt_cfg = self.config["optimizer"]
        opt_kwargs = dict(opt_cfg.get("kwargs", {}))
        optimizer = make_optimizer(opt_cfg.get("type", "Adam"), **opt_kwargs)

        sch_cfg = self.config["lr_scheduler"]
        sk = dict(sch_cfg.get("kwargs", {}))
        scheduler = ReduceLROnPlateau(
            mode=sk.get("mode", "min"),
            factor=sk.get("factor", 0.1),
            patience=sk.get("patience", 10),
            threshold=sk.get("threshold", 1e-4),
            threshold_mode=sk.get("threshold_mode", "rel"),
        )

        y, conditions = self.data
        (y_tr, c_tr), (y_val, c_val) = self.data_handler.split_dataset(
            y, conditions, cfg_t["validation_split"], seed=self.seed
        )
        data_sharding = None
        if self.mesh is not None:
            data_sharding = batch_sharding(self.mesh, 1)
        if self.verbose:
            print(f"[trainer] staging dataset to device ({y_tr.nbytes / 1e6:.0f} MB labels + "
                  f"{sum(c.nbytes for c in c_tr) / 1e6:.0f} MB conditions)...", flush=True)
        train_set = DeviceDataset(y_tr, c_tr, None)
        val_set = DeviceDataset(y_val, c_val, None)
        if self.verbose:
            print("[trainer] dataset staged", flush=True)

        key = jax.random.key(self.seed)
        if params is None:
            key, init_key = jax.random.split(key)
            params = model.init(init_key)
        # Pretrained-conditioner workflow (training.pretrained_features):
        # graft saved feature-network weights into the fresh tree.
        pretrained_path = cfg_t.get("pretrained_features")
        if pretrained_path:
            from bcnf_tpu.models.pretrained import load_pretrained_features

            params = load_pretrained_features(params, pretrained_path)
            if self.verbose:
                print(f"Loaded pretrained features from {pretrained_path}")
        # Glow-style data-dependent ActNorm init (SURVEY.md Q7 fix): applied
        # only when the scales are still at their 1.0 default, so resumed or
        # pre-trained parameter trees are never clobbered.
        if (
            bool(cfg_t.get("actnorm_data_init", True))
            and hasattr(model, "init_actnorm")
            and getattr(model, "actnorm", None) is not None
            and "blocks" in params
            and "actnorm" in params["blocks"]
            and bool(jnp.all(params["blocks"]["actnorm"]["scale"] == 1.0))
        ):
            # Cap the init batch at one *training* batch (Glow semantics): the
            # train step must fit batch_size rows, so this can never OOM where
            # training wouldn't — video conditions at 1024 rows blow HBM (the
            # CNN sees rows x cams x T frames at once).
            nb = min(1024, train_set.n, int(cfg_t.get("batch_size", 1024)))
            if self.verbose:
                print(f"[trainer] actnorm data init ({nb} rows, compiles once)...", flush=True)
            params = model.init_actnorm(
                params, train_set.y[:nb], *[c[:nb] for c in train_set.conditions]
            )
            if self.verbose:
                print("[trainer] actnorm init done", flush=True)
        params = replicate(self.mesh, params)
        opt_state = replicate(self.mesh, optimizer.init(params))

        train_step, val_step = self._build_steps(model, optimizer)

        start_epoch = 0
        if self.checkpoint_dir:
            ckpt_path = latest_checkpoint(self.checkpoint_dir)
            if ckpt_path:
                state = load_checkpoint(ckpt_path)
                params = replicate(self.mesh, jax.tree.map(jnp.asarray, state["params"]))
                opt_state = replicate(self.mesh, jax.tree.map(jnp.asarray, state["opt_state"]))
                scheduler.load_state_dict(state["scheduler"])
                start_epoch = state["epoch"] + 1
                key = jax.random.wrap_key_data(jnp.asarray(state["key"]))
                if self.verbose:
                    print(f"Resumed from {ckpt_path} at epoch {start_epoch}")

        self.meta_scheduler = TrainerParameterHistoryHandler(
            val_loss_window_size=cfg_t["val_loss_window_size"],
            val_loss_patience=cfg_t["val_loss_patience"],
            val_loss_tolerance_mode=cfg_t["val_loss_tolerance_mode"],
            val_loss_tolerance=cfg_t["val_loss_tolerance"],
            fold=fold,
            sink=self.sink,
        )
        ms = self.meta_scheduler

        batch_size = cfg_t["batch_size"]
        timeout = cfg_t.get("timeout")
        n_epochs = cfg_t["n_epochs"]
        # Divergence policy: "raise" mirrors the reference
        # (`trainer.py:168-169` raises TrainingDivergedError mid-run, losing
        # the model); "stop" ends training gracefully and returns the best
        # parameters seen; "rescue" restores the best parameters, halves the
        # learning rate, and keeps training — elastic recovery the reference
        # lacks entirely (SURVEY.md 5.3).
        on_divergence = cfg_t.get("on_divergence", "raise")
        keep_best = bool(cfg_t.get("keep_best", False))
        track_best = keep_best or on_divergence == "rescue"
        best_params = None
        best_val = float("inf")
        n_rescues = 0
        start_time = time.time()
        step = 0

        def finish(p: Any) -> Any:
            return best_params if (track_best and best_params is not None) else p

        # a dataset smaller than the batch would otherwise yield zero
        # (drop_remainder) training batches per epoch
        batch_size = min(batch_size, train_set.n)

        if self.verbose:
            print("[trainer] entering epoch loop (first step compiles)...", flush=True)
        for epoch in range(start_epoch, n_epochs):
            ms.update_epoch(epoch)

            # ---- training pass
            key, shuffle_key = jax.random.split(key)
            train_metrics = []
            for by, bc in train_set.batches(batch_size, shuffle_key, drop_remainder=True):
                if self.mesh is not None:
                    by, bc = shard_batch(self.mesh, (by, tuple(bc)))
                step_key = jax.random.fold_in(key, step)
                params, opt_state, metrics = train_step(params, opt_state, by, tuple(bc), step_key)
                train_metrics.append(metrics)
                step += 1
            tm = np.mean(jax.device_get(jnp.stack(train_metrics)), axis=0)
            train_loss, train_nll, train_mse = float(tm[0]), float(tm[1]), float(tm[2])

            diverged = train_loss > 1e5 or not np.isfinite(train_loss)
            if diverged and on_divergence == "rescue" and best_params is not None:
                # Elastic recovery: restore the best parameters, reset the
                # optimizer, and halve the learning rate. Stops at an lr
                # floor so a pathological run still terminates.
                lr_now = get_learning_rate(opt_state)
                new_lr = lr_now * 0.5
                params = jax.tree.map(jnp.copy, best_params)
                opt_state = replicate(self.mesh, optimizer.init(params))
                opt_state = set_learning_rate(opt_state, new_lr)
                n_rescues += 1
                ms.parameter_history.setdefault("rescues", []).append(
                    {"epoch": epoch, "lr": float(new_lr)}
                )
                if self.verbose:
                    print(f"[rescue {n_rescues}] diverged at epoch {epoch}; "
                          f"restored best params, lr -> {new_lr:.2e}")
                if new_lr < 1e-8:
                    ms.parameter_history["stop_reason"] = "rescue_lr_floor"
                    return finish(params)
                continue
            if diverged and epoch > 10:
                if on_divergence in ("stop", "rescue"):
                    ms.parameter_history["stop_reason"] = "diverged"
                    return finish(params)
                raise TrainingDivergedError(
                    f"Loss exploded to {train_loss} at epoch {epoch}"
                )

            # ---- validation pass (fixed-shape padded batches: compiles once)
            val_metrics, val_wsums, z_means, z_stds = [], [], [], []
            for by, bc, bw in val_set.batches_padded(batch_size):
                if self.mesh is not None:
                    by, bc = shard_batch(self.mesh, (by, tuple(bc)))
                metrics, wsum, z_mean, z_std = val_step(params, by, tuple(bc), bw)
                val_metrics.append(metrics)
                val_wsums.append(wsum)
                z_means.append(z_mean)
                z_stds.append(z_std)
            ws = np.asarray(jax.device_get(jnp.stack(val_wsums)), dtype=np.float64)
            ws /= ws.sum()
            vm = np.average(jax.device_get(jnp.stack(val_metrics)), axis=0, weights=ws)
            val_loss, val_nll, val_mse, val_ld = (float(v) for v in vm)
            z_mean = np.average(jax.device_get(jnp.stack(z_means)), axis=0, weights=ws)
            z_std = np.average(jax.device_get(jnp.stack(z_stds)), axis=0, weights=ws)

            ms.update_rolling_validation_loss(val_loss)
            if track_best and np.isfinite(val_loss) and val_loss < best_val:
                best_val = val_loss
                best_params = jax.tree.map(jnp.copy, params)

            lr = get_learning_rate(opt_state)
            ms.log("train_loss", train_loss)
            ms.log("train_loss_mse", train_mse)
            ms.log("train_loss_nll", train_nll)
            ms.log("val_loss", val_loss)
            ms.log("val_loss_mse", val_mse)
            ms.log("val_loss_nll", val_nll)
            ms.log("lr", lr)
            ms.log("distance_to_last_best_val_loss", epoch - ms.best_val_epoch)
            ms.log("time", time.time())
            ms.log("z_mean_mean", float(z_mean.mean()))
            ms.log("z_mean_std", float(z_mean.std()))
            ms.log("z_std_mean", float(z_std.mean()))
            ms.log("z_std_std", float(z_std.std()))
            ms.log("log_det_J", val_ld)

            new_lr = scheduler.step(ms.val_loss_rolling_avg, lr)
            if new_lr != lr:
                opt_state = set_learning_rate(opt_state, new_lr)

            ms.update_best_loss()

            if (self.checkpoint_every and self.checkpoint_dir
                    and (epoch + 1) % self.checkpoint_every == 0
                    and jax.process_index() == 0):
                save_checkpoint(
                    f"{self.checkpoint_dir}/ckpt_{epoch}.pkl",
                    {
                        "params": params,
                        "opt_state": opt_state,
                        "scheduler": scheduler.state_dict(),
                        "epoch": epoch,
                        "key": jax.random.key_data(key),
                    },
                    metadata={"run_name": self.run_name, "epoch": epoch, "val_loss": val_loss},
                )

            if epoch == start_epoch:
                # Exclude the first epoch (XLA compile, potentially minutes on
                # a remote-tunnel TPU) from the wall-clock training budget;
                # the reference's timeout measures torch eager training where
                # warmup is negligible (`trainer.py:236-238`).
                start_time = time.time()

            if ms.patience_exceeded:
                ms.parameter_history["stop_reason"] = "val_loss_plateau"
                return finish(params)
            if timeout is not None and time.time() - start_time > timeout:
                ms.parameter_history["stop_reason"] = "timeout"
                return finish(params)

        ms.parameter_history["stop_reason"] = "max_epochs"
        return finish(params)

def train_CondRealNVP(
    model: Any,
    params: Any,
    y_train: np.ndarray,
    conditions_train: Sequence[np.ndarray],
    y_val: np.ndarray,
    conditions_val: Sequence[np.ndarray],
    n_epochs: int = 1,
    batch_size: int = 64,
    lr: float = 1e-3,
    val_loss_patience: int | None = None,
    val_loss_tolerance: float = 1e-3,
    val_loss_tolerance_mode: str = "rel",
    timeout: float | None = None,
    verbose: bool = False,
    seed: int = 0,
) -> tuple[Any, dict]:
    """Functional training API (reference `train_CondRealNVP`,
    `src/bcnf/train/train.py:19-219`) used by cross-validation; returns
    `(params, loss_history)`."""
    config = {
        "global": {"dtype": "float32"},
        "training": {
            "validation_split": 0.0,
            "val_loss_window_size": 1,
            "val_loss_patience": val_loss_patience,
            "val_loss_tolerance": val_loss_tolerance,
            "val_loss_tolerance_mode": val_loss_tolerance_mode,
            "batch_size": batch_size,
            "n_epochs": n_epochs,
            "timeout": timeout,
            "random_state": seed,
        },
        "optimizer": {"type": "Adam", "kwargs": {"lr": lr}},
        "lr_scheduler": {"type": "ReduceLROnPlateau", "kwargs": {"patience": max(n_epochs, 1)}},
    }
    trainer = Trainer(
        config,
        verbose=verbose,
        data=(y_train, list(conditions_train)),
        seed=seed,
    )
    # override the split: use the provided train/val sets directly
    trainer.data_handler = TrainerDataHandler()
    trainer.data_handler.split_dataset = (  # type: ignore[method-assign]
        lambda y, c, ratio, seed=0: ((y_train, list(conditions_train)), (y_val, list(conditions_val)))
    )
    params = trainer.train(model, params)
    history = {
        "train": [v for _, v in trainer.meta_scheduler.parameter_history.get("train_loss", [])],
        "val": [v for _, v in trainer.meta_scheduler.parameter_history.get("val_loss", [])],
        "stop_reason": trainer.meta_scheduler.parameter_history.get("stop_reason"),
    }
    return params, history
