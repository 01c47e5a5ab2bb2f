"""bcnf_tpu — a TPU-native (JAX/XLA/Pallas) framework for Ballistic
Conditional Normalizing Flows, with the capabilities of the reference
psaegert/bcnf implementation redesigned TPU-first.

Public import surface mirrors the reference (`src/bcnf/__init__.py:1-4`).
"""

from bcnf_tpu.config import ParameterIndexMapping, load_config
from bcnf_tpu.errors import TrainingDivergedError
from bcnf_tpu.models import CondRealNVP, CondRealNVP_v2
from bcnf_tpu import plots

__version__ = "0.1.0"

__all__ = [
    "CondRealNVP",
    "CondRealNVP_v2",
    "plots",
    "load_config",
    "ParameterIndexMapping",
    "TrainingDivergedError",
    "__version__",
]
