"""Pretrained-conditioner workflow.

The reference implies (but never implements — its `*_pretrained.yaml` configs
are stale legacy-schema files, e.g. `configs/runs/dev/trajectory_LSTM_large_pretrained.yaml`,
`configs/runs/dev/videos_CNN_large_pretrained.yaml`, unreadable by its own
`from_config` at `src/bcnf/models/cnf.py:442-457`) loading pretrained
feature-network weights into a new flow. This module makes that a real,
validated capability:

- `load_pretrained_features(params, path)` grafts a saved feature-network
  subtree into a freshly initialized parameter tree (shape-checked),
- the Trainer honors `training.pretrained_features: <path>` (with
  `{{BCNF_ROOT}}` templating) and optional `training.freeze_features: true`
  (conditioner gradients zeroed, flow-only training).
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import jax.numpy as jnp

from bcnf_tpu.config import sub_root_path


def extract_features_subtree(tree: Any) -> Any:
    """Accept either a full CondRealNVP params tree (with a "features" key)
    or a bare feature-network subtree."""
    if isinstance(tree, dict) and "features" in tree:
        return tree["features"]
    return tree


def load_pretrained_features(params: Any, path: str) -> Any:
    """Return `params` with `params["features"]` replaced by the pretrained
    subtree loaded from `path` (a pickle of a full params tree or a bare
    features subtree). Structure and leaf shapes must match exactly."""
    if "features" not in params:
        raise ValueError(
            "Model has no feature networks; cannot load pretrained features"
        )
    with open(sub_root_path(path), "rb") as f:
        loaded = pickle.load(f)
    feats = jax.tree.map(jnp.asarray, extract_features_subtree(loaded))

    cur_struct = jax.tree.structure(params["features"])
    new_struct = jax.tree.structure(feats)
    if cur_struct != new_struct:
        raise ValueError(
            f"Pretrained feature tree structure mismatch:\n"
            f"  model:      {cur_struct}\n  pretrained: {new_struct}"
        )
    for cur, new in zip(jax.tree.leaves(params["features"]), jax.tree.leaves(feats)):
        if cur.shape != new.shape:
            raise ValueError(
                f"Pretrained feature leaf shape mismatch: model {cur.shape} "
                f"vs pretrained {new.shape}"
            )
    out = dict(params)
    out["features"] = feats
    return out
