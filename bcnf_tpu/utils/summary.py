"""Model summaries via shape evaluation.

Replaces the reference's torchsummary-based `model_summary`
(`src/bcnf/train/utils.py:61-77`) with a `jax.eval_shape` tree walk — no
device memory is touched, so summarizing a multi-billion-parameter config is
free (SURVEY.md section 7.1 "param-count CLI + eval_shape-based summary").
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def param_tree_summary(params: Any, max_depth: int = 3) -> str:
    """Hierarchical parameter-count table from a (possibly abstract) pytree."""
    rows: dict[str, int] = {}

    def walk(tree: Any, path: tuple[str, ...]) -> None:
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (str(k),))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + (str(i),))
        else:
            size = int(np.prod(tree.shape)) if hasattr(tree, "shape") else 1
            key = "/".join(path[:max_depth]) or "<root>"
            rows[key] = rows.get(key, 0) + size

    walk(params, ())
    total = sum(rows.values())
    width = max(len(k) for k in rows) if rows else 10
    lines = [f"{'module':<{width}}  params"]
    lines += [f"{k:<{width}}  {v:,}" for k, v in sorted(rows.items())]
    lines.append(f"{'TOTAL':<{width}}  {total:,}")
    return "\n".join(lines)


def model_summary(model: Any, seed: int = 0) -> str:
    """Summarize a model without allocating parameters (shape-only init)."""
    abstract = jax.eval_shape(lambda k: model.init(k), jax.random.key(seed))
    return param_tree_summary(abstract)
