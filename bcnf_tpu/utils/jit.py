"""Backend-aware jit helpers.

`tpu_safe_jit` exists because current libtpu builds can abort inside XLA's
memory-bound loop optimizer (`memory_bound_loop_optimizer.cc: Check failed:
begin_idx_in_loop <= end_idx_in_loop`) when compiling some of this package's
rejection-sampling programs (observed on TPU v5e, libtpu 2026-08, triggered
by `bcnf_tpu.simulation.sampling._stage_params`). Disabling that single
optimization pass side-steps the compiler bug; it is a memory-schedule
refinement for loops, not a correctness pass, and its absence is not
measurable on these programs.

The flag is TPU-only, so it must not be passed to CPU/GPU clients (their
flag parsers reject unknown `xla_tpu_*` options). We therefore defer the
`jax.jit` call until the first invocation, when the active backend is known,
and cache one jitted callable per backend.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax

_TPU_COMPILER_OPTIONS = {
    "xla_tpu_memory_bound_loop_optimizer_options": "enabled:false",
}


def tpu_safe_jit(fun: Callable[..., Any] | None = None, **jit_kwargs: Any) -> Callable[..., Any]:
    """Like ``jax.jit`` but disables the TPU memory-bound loop optimizer.

    Usable as ``@tpu_safe_jit`` or ``@tpu_safe_jit(static_argnames=...)``.
    The wrapped function keeps the original under ``__wrapped__``.
    """
    if fun is None:
        return functools.partial(tpu_safe_jit, **jit_kwargs)

    jitted: dict[str, Callable[..., Any]] = {}

    @functools.wraps(fun)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        backend = jax.default_backend()
        if backend not in jitted:
            opts = _TPU_COMPILER_OPTIONS if backend == "tpu" else None
            jitted[backend] = jax.jit(fun, compiler_options=opts, **jit_kwargs)
        return jitted[backend](*args, **kwargs)

    return wrapper
