from bcnf_tpu.utils.io import load_data, save_data
from bcnf_tpu.utils.misc import (
    get_data_type,
    get_gaussian_kernel,
    inn_nll_loss,
    partconv1d,
)
from bcnf_tpu.utils.summary import model_summary, param_tree_summary
from bcnf_tpu.utils.prng import fold_in_step, key_from_seed, key_stream, split_like

__all__ = [
    "load_data",
    "save_data",
    "inn_nll_loss",
    "get_gaussian_kernel",
    "partconv1d",
    "get_data_type",
    "key_from_seed",
    "key_stream",
    "split_like",
    "fold_in_step",
    "model_summary",
    "param_tree_summary",
]
