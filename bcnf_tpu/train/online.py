"""On-device "infinite data" training: fresh simulated batches every step.

The reference trains on a frozen 5k-sample pickle (reference
`src/bcnf/train/trainer_data_handler.py:49-73`) because its CPU rejection
sampler takes minutes-to-hours per dataset. On TPU the whole pipeline
(prior -> integrate -> filter -> condition assembly) is one jit program, so
the trainer can draw a *new* batch from the prior every step — the infinite
data regime (SURVEY.md section 7.1): no train/val gap by construction, no
host dataloader, training never leaves HBM.

Rejection under jit uses oversample-and-compact: draw `ceil(batch * k)`
candidates, compute the acceptance mask branch-free, and gather the first
`batch` accepted rows (stable argsort of the rejection mask); if acceptance
undershoots, accepted rows repeat — harmless for SGD. Per-chip independence
for data parallelism comes from folding the device index into the key.
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from bcnf_tpu.config import PARAMETER_ALIASES, ParameterIndexMapping
from bcnf_tpu.simulation.physics import n_steps_for, simulate_trajectory
from bcnf_tpu.simulation.priors import HashableConfig, sample_ballistic_parameters
from bcnf_tpu.train.history import MetricSink
from bcnf_tpu.utils.jit import tpu_safe_jit
from bcnf_tpu.utils.misc import inn_nll_loss


class OnlineSimulator:
    """A jit-compiled (y, conditions) batch source drawn from the prior."""

    def __init__(
        self,
        prior_config: dict,
        parameter_index_mapping: ParameterIndexMapping,
        condition_groups: Sequence[Sequence[str]] = (("trajectories",),),
        dt: float = 0.067,
        T: float = 2.0,
        num_cams: int = 2,
        break_on_impact: bool = False,
        filter_runaway: bool = True,
        oversample: float = 1.25,
        n_substeps: int = 4,
        ratio: tuple[int, int] = (16, 9),
        fov_horizontal: float = 70.0,
        cam1_radian: float = 0.0,
        renderer: str = "analytic",
        legacy_cam_geometry: bool = False,
        observation_noise: float = 0.0,
    ) -> None:
        self.prior = HashableConfig(
            prior_config.to_dict() if hasattr(prior_config, "to_dict") else prior_config
        )
        self.mapping = parameter_index_mapping
        self.condition_groups = tuple(tuple(g) for g in condition_groups)
        self.dt = float(dt)
        self.T = float(T)
        self.num_cams = num_cams
        self.break_on_impact = break_on_impact
        self.filter_runaway = filter_runaway
        self.oversample = oversample
        self.n_substeps = n_substeps
        self.n_steps = n_steps_for(T, dt)
        # video conditions: render accepted rows on device inside the same
        # jit program (the reference cannot do this at all — its renderer is
        # per-frame host NumPy, `src/bcnf/simulation/camera.py:74-150`)
        self.render = any("videos" in g for g in self.condition_groups)
        self.ratio = tuple(ratio)
        self.fov_horizontal = float(fov_horizontal)
        self.cam1_radian = float(cam1_radian)
        self.renderer = renderer
        self.legacy_cam_geometry = bool(legacy_cam_geometry)
        self.observation_noise = float(observation_noise)

    def _vectorize(self, p: dict[str, jnp.ndarray]) -> jnp.ndarray:
        cols = []
        for name in self.mapping.parameters:
            key = name if name in p else next(
                (a for a in PARAMETER_ALIASES.get(name, ()) if a in p), None
            )
            if key is None:
                raise KeyError(f"Parameter {name} not produced by the simulator")
            cols.append(p[key])
        return jnp.stack(cols, axis=-1)

    @partial(jax.jit, static_argnames=("self", "batch"))
    def sample_batch(self, key: jax.Array, batch: int) -> tuple[jnp.ndarray, tuple]:
        """Draw an accepted batch: returns `(y (B, D), conditions)`."""
        n_raw = math.ceil(batch * self.oversample)
        key, k_render, k_noise = jax.random.split(key, 3)
        p = sample_ballistic_parameters(key, n_raw, self.prior.data, self.num_cams)

        x0 = jnp.stack([p["x0_x"], p["x0_y"], p["x0_z"]], axis=-1)
        v0 = jnp.stack([p["v0_x"], p["v0_y"], p["v0_z"]], axis=-1)
        g = jnp.stack([p["g_x"], p["g_y"], p["g_z"]], axis=-1)
        w = jnp.stack([p["w_x"], p["w_y"], p["w_z"]], axis=-1)
        a = jnp.stack([p["a_x"], p["a_y"], p["a_z"]], axis=-1)
        traj = simulate_trajectory(
            x0, v0, g, w, p["b"], p["m"], p["rho"], p["r"], a,
            n_steps=self.n_steps, dt=self.dt,
            break_on_impact=self.break_on_impact, n_substeps=self.n_substeps,
        )

        accept = jnp.isfinite(traj).all(axis=(1, 2))
        if self.filter_runaway:
            accept &= ~(p["g_z"] + p["a_z"] > 0)  # reference `sampling.py:320`
            accept &= ~(p["x0_z"] < 0)  # reference `sampling.py:332`
        # compact: indices of accepted rows first (stable), take `batch`
        order = jnp.argsort(~accept, stable=True)
        idx = order[:batch]

        p = {k: v[idx] for k, v in p.items()}
        traj = traj[idx]
        y = self._vectorize(p)

        data = dict(p)
        if self.observation_noise > 0:
            from bcnf_tpu.simulation.observation import gaussian_observation_noise

            data["trajectories"] = gaussian_observation_noise(
                k_noise, traj, std=self.observation_noise
            )
        else:
            data["trajectories"] = traj
        if self.render:
            # render only the compacted `batch` rows (the expensive stage),
            # reusing the dataset generator's vmapped render program
            from bcnf_tpu.simulation.sampling import _stage_render

            cam_radians = jnp.concatenate(
                [jnp.full((batch, 1), self.cam1_radian), p["cam_radian_array"]],
                axis=-1,
            )
            data["cam_radian_array"] = cam_radians
            # __wrapped__: we are already inside a jit trace, and the
            # wrapper's TPU compiler_options cannot apply on a nested jit
            videos, _ = _stage_render.__wrapped__(
                k_render, p, traj, cam_radians, self.num_cams, self.ratio,
                self.fov_horizontal, self.renderer, self.legacy_cam_geometry,
            )
            data["videos"] = videos

        conditions = []
        # run configs say `cam_radian`; the prior sampler emits
        # `cam_radian_array` (same alias table as train/data.py)
        key_aliases = {"cam_radian": "cam_radian_array"}
        for group in self.condition_groups:
            vals = []
            for c in group:
                v = data[key_aliases.get(c, c) if c not in data else c]
                if v.ndim == 1:
                    v = v[:, None]
                vals.append(v)
            conditions.append(jnp.concatenate(vals, axis=1) if len(vals) > 1 else vals[0])
        return y, tuple(conditions)

    def __hash__(self) -> int:
        return hash((self.prior, tuple(self.mapping.parameters), self.condition_groups,
                     self.dt, self.T, self.num_cams, self.break_on_impact,
                     self.filter_runaway, self.oversample, self.n_substeps,
                     self.render, self.ratio, self.fov_horizontal,
                     self.cam1_radian, self.renderer, self.legacy_cam_geometry,
                     self.observation_noise))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, OnlineSimulator) and hash(self) == hash(other)


def train_online(
    model: Any,
    params: Any,
    simulator: OnlineSimulator,
    n_steps: int = 1000,
    batch_size: int = 256,
    lr: float = 2e-4,
    lr_decay: bool = False,
    max_grad_norm: float = 1.0,
    eval_every: int = 100,
    eval_batches: int = 4,
    hybrid_weight: float = 0.0,
    seed: int = 0,
    sink: MetricSink | None = None,
    timeout: float | None = None,
    loss_fn: Callable | None = None,
    mesh: Any = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 500,
    resume: bool = False,
) -> tuple[Any, dict]:
    """Step-based training loop over fresh simulated batches.

    The data-generation program and the train step fuse into one dispatch
    pipeline; evaluation draws held-out fresh batches (infinite data: the
    "validation set" is just more simulation).

    With `mesh` the step runs data-parallel via shard_map: each device folds
    its axis index into the PRNG key, simulates its own `batch_size /
    n_devices` shard on-device (no host data movement at all), and gradients
    are pmean-reduced over the mesh axis. Because the per-shard trace is
    single-device, the fused Pallas kernels stay legal inside
    (`bcnf_tpu.models.cnf.spmd_local`, same scheme as the Trainer's DP step).

    With `checkpoint_dir` the loop saves `{params, opt_state, key, step}`
    every `checkpoint_every` steps (atomic, host-0) and `resume=True`
    restarts from the newest checkpoint — the step counter and PRNG key are
    restored, so a resumed run continues the exact data stream.
    """
    # cosine lr decay over the step budget: the infinite-data regime has no
    # validation plateau to drive ReduceLROnPlateau (the dataset trainer's
    # scheduler), so convergence needs an explicit schedule — without it the
    # flow stalls at the constant-lr noise floor well short of the posterior
    # sharpness the dataset runs reach.
    lr_fn = optax.cosine_decay_schedule(lr, max(n_steps, 1), alpha=0.02) if lr_decay else lr
    optimizer = optax.chain(
        optax.clip_by_global_norm(max_grad_norm), optax.adam(lr_fn)
    )
    loss_fn = loss_fn or inn_nll_loss
    n_cond = model.n_conditions

    # Glow-style data-dependent ActNorm init (SURVEY.md Q7), same guard as
    # Trainer.train: only when scales are still at their 1.0 default (a
    # resumed checkpoint overwrites params below anyway). Without this the
    # online run spends thousands of steps just normalizing 26 blocks of
    # activations — measured on videos_CNN_LSTM_large: +11 NLL at step 500
    # from scale-1 vs the data-initialized Trainer's near-optimal start.
    if (
        hasattr(model, "init_actnorm")
        and getattr(model, "actnorm", None) is not None
        and isinstance(params, dict)
        and "blocks" in params
        and "actnorm" in params.get("blocks", {})
        and bool(jnp.all(params["blocks"]["actnorm"]["scale"] == 1.0))
    ):
        y0, conds0 = simulator.sample_batch(jax.random.key(seed + 99), batch_size)
        params = model.init_actnorm(params, y0, *conds0)

    def objective(params: Any, y: jnp.ndarray, conditions: tuple, rng: jax.Array) -> tuple:
        if n_cond > 0:
            z, log_det, h = model.forward(params, y, *conditions, rng=rng, train=True, return_features=True)
        else:
            z, log_det = model.forward(params, y, rng=rng, train=True)
            h = None
        nll = loss_fn(z, log_det)
        mse = jnp.zeros(())
        if hybrid_weight > 0 and h is not None:
            mse = jnp.mean((model.predict_head(params, h) - y) ** 2)
        return (nll + mse * hybrid_weight) / (1 + hybrid_weight), (nll, mse)

    def _grads(key: jax.Array, params: Any, batch: int) -> tuple:
        k_data, k_drop = jax.random.split(key)
        y, conditions = simulator.sample_batch(k_data, batch)
        (loss, (nll, mse)), grads = jax.value_and_grad(objective, has_aux=True)(
            params, y, conditions, k_drop
        )
        return grads, jnp.stack([loss, nll, mse])

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from bcnf_tpu.models.cnf import spmd_local
        from bcnf_tpu.parallel.mesh import replicate

        axis = mesh.axis_names[0]
        n_dev = int(mesh.devices.size)
        if batch_size % n_dev != 0:
            raise ValueError(
                f"online batch_size={batch_size} must divide the mesh size {n_dev}"
            )
        local_batch = batch_size // n_dev

        def local_grads(key: jax.Array, params: Any) -> tuple:
            # independent per-chip data stream: fold the device index in
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            with spmd_local():
                grads, metrics = _grads(key, params, local_batch)
            return jax.lax.pmean(grads, axis), jax.lax.pmean(metrics, axis)

        grad_fn = shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P()), out_specs=(P(), P()),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        params = replicate(mesh, params)
        opt_state = replicate(mesh, optimizer.init(params))
    else:
        grad_fn = partial(_grads, batch=batch_size)
        opt_state = optimizer.init(params)

    # tpu_safe_jit: the fused data+train program inlines the prior sampler,
    # whose rejection scan can trip libtpu's memory-bound loop optimizer
    # (see utils/jit.py) — same mitigation as the dataset generator's stages
    @tpu_safe_jit(donate_argnums=(1, 2))
    def step_fn(key: jax.Array, params: Any, opt_state: Any) -> tuple:
        grads, metrics = grad_fn(key, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    @tpu_safe_jit
    def eval_fn(key: jax.Array, params: Any) -> jnp.ndarray:
        y, conditions = simulator.sample_batch(key, batch_size)
        z, log_det = model.forward(params, y, *conditions) if n_cond > 0 else model.forward(params, y)
        return loss_fn(z, log_det)

    key = jax.random.key(seed)
    step_start = 0
    history: dict[str, list] = {"train_loss": [], "eval_nll": []}

    if checkpoint_dir is not None and resume:
        from bcnf_tpu.train.checkpoint import latest_checkpoint, load_checkpoint

        ckpt_path = latest_checkpoint(checkpoint_dir, prefix="online_")
        if ckpt_path is not None:
            state = load_checkpoint(ckpt_path)
            restore = (lambda t: jax.tree.map(jnp.asarray, t)) if mesh is None else (
                lambda t: replicate(mesh, jax.tree.map(jnp.asarray, t)))
            params = restore(state["params"])
            opt_state = restore(state["opt_state"])
            key = jax.random.wrap_key_data(jnp.asarray(state["key"]))
            step_start = int(state["step"])
            history = state.get("history", history)
            history.pop("stop_reason", None)

    def _save(step: int) -> None:
        if checkpoint_dir is None:
            return
        from bcnf_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(
            os.path.join(checkpoint_dir, f"online_{step}.pkl"),
            {"params": params, "opt_state": opt_state,
             "key": jax.random.key_data(key), "step": step, "history": history},
            metadata={"step": step, "batch_size": batch_size, "seed": seed},
        )

    start = time.time()
    stop_reason = "max_steps"
    step = step_start
    for step in range(step_start, n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(sub, params, opt_state)
        if (step + 1) % eval_every == 0 or step == n_steps - 1:
            m = jax.device_get(metrics)
            evals = []
            for i in range(eval_batches):
                k_eval = jax.random.fold_in(
                    jax.random.key(seed + 1), step * eval_batches + i)
                evals.append(float(eval_fn(k_eval, params)))
            eval_nll = sum(evals) / len(evals)
            history["train_loss"].append((step + 1, float(m[0])))
            history["eval_nll"].append((step + 1, eval_nll))
            if sink is not None:
                sink.log({"train_loss": float(m[0]), "eval_nll": eval_nll}, step + 1)
        if (step + 1) % checkpoint_every == 0:
            _save(step + 1)
        if timeout is not None and time.time() - start > timeout:
            stop_reason = "timeout"
            break
    if checkpoint_dir is not None:
        _save(step + 1)
    history["stop_reason"] = stop_reason
    return params, history
