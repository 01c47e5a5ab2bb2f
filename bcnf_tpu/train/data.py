"""Training-data assembly: generate-or-load, condition tensors, splits, batches.

Replaces the reference's `TrainerDataHandler`
(`src/bcnf/train/trainer_data_handler.py:14-209`). Differences by design:

- No DataLoader/worker processes: the dataset (5k trajectories ~ 2 MB; video
  sets ~ GBs) is held as device arrays and batches are gathered on device —
  training never touches the host per step (SURVEY.md section 7.1).
- SURVEY.md Q2 fix: `split_dataset` performs a *seeded shuffled* split. The
  reference computes `int(1 - split_ratio * len)` (negative; a precedence
  bug) and discards its `RandomSampler`, yielding a deterministic unshuffled
  head/tail split (`trainer_data_handler.py:195-203`).
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bcnf_tpu.config import ParameterIndexMapping
from bcnf_tpu.simulation.sampling import generate_data
from bcnf_tpu.utils.io import load_data, save_data


class TrainerDataHandler:
    def get_data_for_training(
        self,
        config: dict,
        parameter_index_mapping: ParameterIndexMapping,
        dtype: jnp.dtype = jnp.float32,
        errors: str = "raise",
        verbose: bool = False,
        seed: int | None = None,
    ) -> tuple[np.ndarray, list[np.ndarray]]:
        """Returns `(y, conditions)` as NumPy arrays.

        Generate-if-missing (reference `trainer_data_handler.py:49-64`), else
        load pickle shards; then assemble condition tensors from the
        `config.global.conditions` key groups (reference `:75-85`; 1-D values
        get a trailing feature axis) and the theta matrix via
        `ParameterIndexMapping.vectorize` (`:86`).
        """
        data_cfg = config["data"]
        path = data_cfg["path"]
        if not os.path.exists(path) or (os.path.isdir(path) and len(os.listdir(path)) == 0):
            if verbose:
                print(f"No data found at {path}. Generating data...")
            data = generate_data(
                config_file=data_cfg["config_file"],
                n=data_cfg["n_samples"],
                output_type=data_cfg["output_type"],
                dt=data_cfg["dt"],
                T=data_cfg["T"],
                num_cams=data_cfg.get("num_cams", 2),
                break_on_impact=data_cfg.get("break_on_impact", True),
                do_filter=data_cfg.get("do_filter", True),
                verbose=data_cfg.get("verbose", verbose),
                observation_noise=float(data_cfg.get("observation_noise", 0.0)),
                seed=seed,
            )
            target = path if not os.path.splitext(path)[1] == "" else os.path.join(
                path, data_cfg.get("data_name", "data.pkl")
            )
            save_data(data, target)
        else:
            if verbose:
                print(f"Loading data from {path}...")
            data = load_data(
                path=path,
                keep_output_type=data_cfg["output_type"],
                n_files=data_cfg.get("n_files"),
                verbose=verbose,
                errors=errors,
            )

        # condition-key aliases: run configs say `cam_radian`
        # (reference `configs/runs/dev/videos_CNN_LSTM_large.yaml:6`) while the
        # generator emits `cam_radian_array` (reference `sampling.py:276`)
        key_aliases = {"cam_radian": "cam_radian_array", "cam_radian_array": "cam_radian"}
        conditions = []
        for condition_keys in config["global"]["conditions"]:
            condition_values = []
            for c in condition_keys:
                if c not in data and c in key_aliases and key_aliases[c] in data:
                    c = key_aliases[c]
                value = np.asarray(data[c], dtype=dtype)
                if value.ndim == 1:
                    value = value[:, None]
                condition_values.append(value)
            conditions.append(np.concatenate(condition_values, axis=1))
        y = np.asarray(parameter_index_mapping.vectorize(data), dtype=dtype)

        if verbose:
            print(f"Conditions: {[c.shape for c in conditions]}; Parameters: {y.shape}")
        return y, conditions

    @staticmethod
    def split_dataset(
        y: np.ndarray,
        conditions: Sequence[np.ndarray],
        split_ratio: float,
        seed: int = 0,
    ) -> tuple[tuple, tuple]:
        """Seeded shuffled train/val split (Q2 fix; see module docstring)."""
        n = len(y)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        n_val = int(round(split_ratio * n))
        val_idx, train_idx = perm[:n_val], perm[n_val:]
        train = (y[train_idx], [c[train_idx] for c in conditions])
        val = (y[val_idx], [c[val_idx] for c in conditions])
        return train, val


class DeviceDataset:
    """A dataset pinned in device memory with on-device batch gathering."""

    def __init__(self, y: np.ndarray, conditions: Sequence[np.ndarray], sharding=None) -> None:
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jnp.asarray
        self.y = put(np.ascontiguousarray(y))
        self.conditions = [put(np.ascontiguousarray(c)) for c in conditions]
        self.n = len(y)

    def batches(
        self,
        batch_size: int,
        key: jax.Array | None = None,
        drop_remainder: bool = False,
    ) -> Iterator[tuple[jnp.ndarray, list[jnp.ndarray]]]:
        """Yield (y, conditions) batches, shuffled when a key is given."""
        if key is not None:
            perm = jax.random.permutation(key, self.n)
        else:
            perm = jnp.arange(self.n)
        n_full = self.n // batch_size
        for i in range(n_full):
            idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            yield jnp.take(self.y, idx, axis=0), [jnp.take(c, idx, axis=0) for c in self.conditions]
        rem = self.n - n_full * batch_size
        if rem and not drop_remainder:
            idx = perm[n_full * batch_size:]
            yield jnp.take(self.y, idx, axis=0), [jnp.take(c, idx, axis=0) for c in self.conditions]

    def batches_padded(
        self, batch_size: int
    ) -> Iterator[tuple[jnp.ndarray, list[jnp.ndarray], jnp.ndarray]]:
        """Yield `(y, conditions, weights)` with every batch padded to a fixed
        `batch_size` so a jitted step compiles exactly once.

        Pad rows wrap around to the start of the dataset and carry weight 0;
        consumers compute weighted means for exact metrics.
        """
        n_total = ((self.n + batch_size - 1) // batch_size) * batch_size
        pos = jnp.arange(n_total)
        idx_all = pos % self.n
        w_all = (pos < self.n).astype(jnp.float32)
        for i in range(n_total // batch_size):
            sl = slice(i * batch_size, (i + 1) * batch_size)
            idx = idx_all[sl]
            yield (
                jnp.take(self.y, idx, axis=0),
                [jnp.take(c, idx, axis=0) for c in self.conditions],
                w_all[sl],
            )

    def n_batches(self, batch_size: int, drop_remainder: bool = False) -> int:
        if drop_remainder:
            return self.n // batch_size
        return (self.n + batch_size - 1) // batch_size
