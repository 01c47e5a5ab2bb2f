"""String -> component registries driven by the YAML config schema.

Parity: reference `src/bcnf/factories.py:13-73` (`SchedulerFactory`,
`OptimizerFactory`, `FeatureNetworkFactory`, `LayerFactory`). Optimizers and
schedulers resolve to optax-based constructions (see
`bcnf_tpu.train.optim`); dense layers/activations resolve through
`bcnf_tpu.ops.nn`.
"""

from __future__ import annotations

from typing import Any

from bcnf_tpu.models.cnn import CNN
from bcnf_tpu.models.feature_network import (
    ConcatenateCondition,
    DualDomainFC,
    DualDomainLSTM,
    DualDomainTransformer,
    FeatureNetwork,
    FrExpFeatureNetwork,
    FullyConnectedFeatureNetwork,
    Identity,
    LSTMFeatureNetwork,
    Transformer,
    VerboseLSTM,
)
from bcnf_tpu.models.layers import AnyGLU, FFTEnrichLayer, FFTLayer, LinearFFTEnriched


class FeatureNetworkFactory:
    """Reference `src/bcnf/factories.py:33-58` — identical type names."""

    REGISTRY: dict[str, type] = {
        "FullyConnected": FullyConnectedFeatureNetwork,
        "CNN": CNN,
        "LSTM": LSTMFeatureNetwork,
        "Transformer": Transformer,
        "ConcatenateCondition": ConcatenateCondition,
        "FrExpFeatureNetwork": FrExpFeatureNetwork,
        "DualDomainLSTM": DualDomainLSTM,
        "DualDomainTransformer": DualDomainTransformer,
        "DualDomainFC": DualDomainFC,
        "VerboseLSTM": VerboseLSTM,
        "AnyGLU": AnyGLU,
        "FFTLayer": FFTLayer,
        "FFTEnrichLayer": FFTEnrichLayer,
        "LinearFFTEnriched": LinearFFTEnriched,
    }

    @staticmethod
    def get_feature_network(network: str | None, network_kwargs: dict[str, Any]) -> FeatureNetwork:
        if network is None:
            return Identity()
        cls = FeatureNetworkFactory.REGISTRY.get(network)
        if cls is None:
            raise NotImplementedError(f"Feature network {network} not implemented")
        kwargs = dict(network_kwargs)
        if cls is not ConcatenateCondition:
            # configs pass `input_size: null` markers only meaningful for
            # ConcatenateCondition (e.g. `trajectory_LSTM_large.yaml:42-44`)
            kwargs = {
                k: v for k, v in kwargs.items()
                if not (v is None and k in ("input_size", "output_size"))
            }
        return cls(**kwargs)


class OptimizerFactory:
    """Resolved in `bcnf_tpu.train.optim` (optax); listed here for API parity
    with reference `src/bcnf/factories.py:23-30`."""

    @staticmethod
    def get_optimizer(optimizer: str, optimizer_kwargs: dict[str, Any]) -> Any:
        from bcnf_tpu.train.optim import make_optimizer

        return make_optimizer(optimizer, **optimizer_kwargs)


class SchedulerFactory:
    """Reference `src/bcnf/factories.py:13-20` — only ReduceLROnPlateau."""

    @staticmethod
    def get_scheduler(scheduler: str, scheduler_kwargs: dict[str, Any]) -> Any:
        from bcnf_tpu.train.optim import ReduceLROnPlateau

        if scheduler == "ReduceLROnPlateau":
            return ReduceLROnPlateau(**scheduler_kwargs)
        raise NotImplementedError(f"Scheduler {scheduler} not implemented")
