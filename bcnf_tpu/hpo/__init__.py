from bcnf_tpu.hpo.gp_minimize import (
    Categorical,
    Integer,
    OptimizeResult,
    Real,
    gp_minimize_fixed,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "Real",
    "Integer",
    "Categorical",
    "OptimizeResult",
    "gp_minimize_fixed",
    "save_checkpoint",
    "load_checkpoint",
]
