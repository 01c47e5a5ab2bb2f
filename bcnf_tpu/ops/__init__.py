from bcnf_tpu.ops.attention import (
    mha_apply,
    mha_init,
    sinusoidal_positional_embeddings,
    transformer_block_apply,
    transformer_block_init,
)
from bcnf_tpu.ops.lstm import lstm_apply, lstm_init
from bcnf_tpu.ops.nn import (
    ACTIVATIONS,
    dropout,
    fft_enrich,
    fft_features,
    get_activation,
    get_dense_layer,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
)

__all__ = [
    "ACTIVATIONS",
    "get_activation",
    "get_dense_layer",
    "linear_init",
    "linear_apply",
    "dropout",
    "fft_features",
    "fft_enrich",
    "layer_norm_init",
    "layer_norm_apply",
    "lstm_init",
    "lstm_apply",
    "mha_init",
    "mha_apply",
    "transformer_block_init",
    "transformer_block_apply",
    "sinusoidal_positional_embeddings",
]
