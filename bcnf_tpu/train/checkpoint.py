"""Step-level checkpoint/resume (params + optimizer + PRNG + schedulers).

The reference has *no* mid-training checkpointing — weights are saved once
after training (`src/bcnf/__main__.py:75-78`); only the HPO loop checkpoints
(`src/bcnf/gp_minimize/gp_minimize.py:166-194`). This module provides the
first-class equivalent mandated by SURVEY.md section 5.4: atomic, multi-host
safe (host-0 writes), restores bitwise-identical training state.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import numpy as np

from bcnf_tpu.parallel.mesh import is_host_zero


def save_checkpoint(path: str, state: dict[str, Any], metadata: dict | None = None) -> None:
    """Atomically pickle a device-fetched pytree state (host 0 only)."""
    if not is_host_zero():
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host_state = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, jax.device_get(state)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    if metadata is not None:
        meta_tmp = path + ".meta.tmp"
        with open(meta_tmp, "w") as f:
            json.dump(metadata, f, indent=2, default=str)
        os.replace(meta_tmp, path + ".meta.json")


def load_checkpoint(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> str | None:
    """Find the newest `<prefix><step>.pkl` in a directory."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".pkl"):
            try:
                step = int(name[len(prefix):-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = name, step
    return os.path.join(directory, best) if best else None
